from .checkpoint import run_resumable_extract  # noqa: F401
