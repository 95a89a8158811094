from .watch import watch_pages

__all__ = ["watch_pages"]
