from .directory import scan_directory  # noqa: F401
