from . import file_io, logger, registry  # noqa: F401
