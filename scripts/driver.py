"""Thin spark-submit driver: forwards argv to codegraphcontext_spark.cli.

(spark-submit needs a .py file; the package itself ships via --py-files.)"""

import sys

from codegraphcontext_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
