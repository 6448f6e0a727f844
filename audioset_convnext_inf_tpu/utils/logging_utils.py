"""Logging + experiment tracking (reference utilities.py:36-58, main.py:286-302).

- :func:`create_logging` - auto-numbered ``NNNN.log`` files + console echo
- :class:`MetricLogger` - wandb when importable, JSONL fallback otherwise
  (the reference hard-requires wandb and even ships an API key; here
  tracking is optional and keyless)
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional


def create_folder(fd: str) -> None:
    os.makedirs(fd, exist_ok=True)


def get_filename(path: str) -> str:
    path = os.path.realpath(path)
    return os.path.splitext(path.split("/")[-1])[0]


def get_sub_filepaths(folder: str):
    paths = []
    for root, _, files in os.walk(folder):
        for name in files:
            paths.append(os.path.join(root, name))
    return paths


def create_logging(log_dir: str, filemode: str = "w") -> logging.Logger:
    """Numbered log file + console (utilities.py:36-58)."""
    create_folder(log_dir)
    i1 = 0
    while os.path.isfile(os.path.join(log_dir, f"{i1:04d}.log")):
        i1 += 1
    log_path = os.path.join(log_dir, f"{i1:04d}.log")
    logging.basicConfig(
        level=logging.DEBUG,
        format="%(asctime)s %(filename)s[line:%(lineno)d] %(levelname)s %(message)s",
        datefmt="%a, %d %b %Y %H:%M:%S",
        filename=log_path,
        filemode=filemode,
    )
    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(logging.Formatter("%(name)-12s: %(levelname)-8s %(message)s"))
    logging.getLogger("").addHandler(console)
    return logging.getLogger("")


class MetricLogger:
    """wandb-or-JSONL metric sink.

    ``log({"train/loss": 0.1}, step=10)``; wandb is used when installed and
    ``WANDB_MODE`` is not disabled, else metrics append to ``metrics.jsonl``.
    """

    def __init__(self, project: str = "audioset-convnext-tpu", run_name: Optional[str] = None,
                 out_dir: str = ".", config: Optional[Dict[str, Any]] = None):
        self._wandb = None
        self._file = None
        try:
            if os.environ.get("WANDB_MODE", "") != "disabled":
                import wandb  # type: ignore

                self._wandb = wandb
                wandb.init(project=project, name=run_name, config=config or {})
        except Exception:
            self._wandb = None
        if self._wandb is None:
            create_folder(out_dir)
            self._file = open(os.path.join(out_dir, "metrics.jsonl"), "a")
            if config:
                self._file.write(json.dumps({"_config": config, "_ts": time.time()}) + "\n")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        elif self._file is not None:
            rec = dict(metrics)
            rec["_step"] = step
            rec["_ts"] = time.time()
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        if self._file is not None:
            self._file.close()
