"""Logger setup (reference core/utils/build.py:43-57: console + log.txt)."""
from __future__ import annotations

import logging
import os
from typing import Optional


def get_logger(name: str, save_path: Optional[str] = None,
               level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(f"semireward_tpu.{name}")
    if logger.handlers:
        return logger
    logger.setLevel(level)
    logger.propagate = False
    fmt = logging.Formatter("[%(asctime)s %(levelname)s] %(message)s",
                            "%H:%M:%S")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if save_path:
        os.makedirs(save_path, exist_ok=True)
        fh = logging.FileHandler(os.path.join(save_path, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
