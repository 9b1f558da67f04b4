"""Print-style logging wrapper with a custom VERBOSE level.

Mirrors the CLI surface of the reference logger (denet/common/logging.py):
``--log-level`` flag, ``init(args)``, ``info/verbose/debug/warning/error``
functions that accept multiple positional arguments print-style, and a
startup banner with argv.
"""
import logging as _logging
import sys

VERBOSE = 15
_logging.addLevelName(VERBOSE, "VERBOSE")

_logger = _logging.getLogger("denet_tpu")
_initialized = False


def _fmt(args):
    return " ".join(str(a) for a in args)


def init(args=None, level=None):
    global _initialized
    if level is None:
        level = getattr(args, "log_level", "info") if args is not None else "info"
    level_num = {"debug": _logging.DEBUG, "verbose": VERBOSE, "info": _logging.INFO,
                 "warning": _logging.WARNING, "error": _logging.ERROR}[str(level).lower()]
    handler = _logging.StreamHandler(sys.stdout)
    handler.setFormatter(_logging.Formatter("%(message)s"))
    _logger.handlers = [handler]
    _logger.setLevel(level_num)
    _initialized = True
    info("argv:", " ".join(sys.argv))


def _ensure_init():
    if not _initialized:
        init(level="info")


def add_arguments(parser):
    parser.add_argument("--log-level", default="info",
                        help="Logging level (debug, verbose, info, warning, error)")


def debug(*args):
    _ensure_init()
    _logger.debug(_fmt(args))


def verbose(*args):
    _ensure_init()
    _logger.log(VERBOSE, _fmt(args))


def info(*args):
    _ensure_init()
    _logger.info(_fmt(args))


def warning(*args):
    _ensure_init()
    _logger.warning(_fmt(args))


def error(*args):
    _ensure_init()
    _logger.error(_fmt(args))
