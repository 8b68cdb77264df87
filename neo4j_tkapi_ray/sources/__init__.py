from .pages import read_pages, read_registry_tables  # noqa: F401
