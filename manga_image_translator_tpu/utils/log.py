"""Hierarchical logging under root logger ``manga-translator``.

Contract: reference ``manga_translator/utils/log.py:1-55`` (root logger name,
per-class child loggers, optional file tee).
"""
from __future__ import annotations

import logging
import sys
from typing import Optional

ROOT_LOGGER_NAME = 'manga-translator'

_root = logging.getLogger(ROOT_LOGGER_NAME)


class _ColorFormatter(logging.Formatter):
    COLORS = {
        logging.DEBUG: '\x1b[37m',
        logging.INFO: '\x1b[36m',
        logging.WARNING: '\x1b[33m',
        logging.ERROR: '\x1b[31m',
        logging.CRITICAL: '\x1b[41m',
    }
    RESET = '\x1b[0m'

    def format(self, record):
        msg = super().format(record)
        if sys.stderr.isatty():
            color = self.COLORS.get(record.levelno, '')
            return f'{color}{msg}{self.RESET}'
        return msg


def init_logging(verbose: bool = False):
    if not _root.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(_ColorFormatter(
            '[%(name)s] [%(levelname)s] %(message)s'))
        _root.addHandler(handler)
    _root.setLevel(logging.DEBUG if verbose else logging.INFO)


def get_logger(name: str) -> logging.Logger:
    return _root.getChild(name)


_file_handlers: dict = {}


def add_file_logger(path: str):
    handler = logging.FileHandler(path, encoding='utf8')
    handler.setFormatter(logging.Formatter(
        '%(asctime)s [%(name)s] [%(levelname)s] %(message)s'))
    _root.addHandler(handler)
    _file_handlers[path] = handler


def remove_file_logger(path: str):
    handler = _file_handlers.pop(path, None)
    if handler is not None:
        _root.removeHandler(handler)
        handler.close()
