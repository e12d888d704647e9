"""Metric loggers: in-memory, CSV (pandas), and optional wandb.

Parity with the reference's `ecnf/utils/loggers.py:14-143` (`Logger` ABC,
`ListLogger`, `PandasLogger`, `WandbLogger`).  wandb is an optional
dependency here — the logger degrades to a no-op with a warning when the
package is absent.
"""
import abc
import os
import pathlib
import pickle
from typing import Any, Dict, List, Mapping, Optional, Union

import numpy as np

LoggingData = Mapping[str, Any]


class Logger(abc.ABC):
    @abc.abstractmethod
    def write(self, data: LoggingData) -> None:
        """Write `data` to the destination."""

    @abc.abstractmethod
    def close(self) -> None:
        """Close the logger; no further writes expected."""


class ListLogger(Logger):
    """In-memory dict-of-lists history with periodic pickling.

    Parity: reference `loggers.py:27-76`.
    """

    def __init__(
        self,
        save: bool = False,
        save_path: str = "/tmp/logging_hist.pkl",
        save_period: int = 100,
    ):
        self.save = save
        self.save_path = save_path
        if save:
            pathlib.Path(save_path).parent.mkdir(exist_ok=True, parents=True)
        self.save_period = save_period
        self.history: Dict[str, List[Union[np.ndarray, float, int]]] = {}
        self.print_warning = False
        self.iter = 0

    def write(self, data: LoggingData) -> None:
        for key, value in data.items():
            try:
                value = float(value)
            except (TypeError, ValueError):
                if not self.print_warning:
                    print("non numeric history values being saved")
                    self.print_warning = True
            self.history.setdefault(key, []).append(value)
        self.iter += 1
        if self.save and (self.iter + 1) % self.save_period == 0:
            with open(self.save_path, "wb") as f:
                pickle.dump(self.history, f)

    def close(self) -> None:
        if self.save:
            with open(self.save_path, "wb") as f:
                pickle.dump(self.history, f)


class CSVLogger(Logger):
    """Append metric rows to a CSV, resume-aware.

    Functional equivalent of the reference `PandasLogger`
    (`loggers.py:92-143`) without requiring pandas at write time: rows are
    buffered and written with a stable, growing column set.
    """

    def __init__(
        self,
        save: bool = True,
        save_path: Optional[str] = None,
        save_period: int = 100,
    ):
        save_dir = save_path or "."
        self.save_path = os.path.join(save_dir, "logging_history.csv")
        self.save = save
        self.save_period = save_period
        self.rows: List[Dict[str, Any]] = []
        self.buffer: List[Dict[str, Any]] = []
        self.iter = 0
        if os.path.exists(self.save_path):
            import pandas as pd

            df = pd.read_csv(self.save_path, index_col=0)
            self.rows = df.to_dict("records")
            self.iter = len(self.rows)

    def write(self, data: LoggingData) -> None:
        row = {}
        for k, v in data.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        self.buffer.append(row)
        self.iter += 1
        if self.save and (self.iter + 1) % self.save_period == 0:
            self._flush()

    def _flush(self) -> None:
        import pandas as pd

        self.rows.extend(self.buffer)
        self.buffer = []
        pathlib.Path(self.save_path).parent.mkdir(exist_ok=True, parents=True)
        pd.DataFrame(self.rows).to_csv(self.save_path)

    def close(self) -> None:
        if self.save:
            self._flush()


class WandbLogger(Logger):
    """wandb-backed logger; degrades to ListLogger when wandb is missing.

    Parity: reference `loggers.py:79-89` (own monotone step, commit=False).
    """

    def __init__(self, **kwargs: Any):
        try:
            import wandb  # noqa: F401

            self._wandb = wandb
            self.run = wandb.init(**kwargs, reinit=True)
        except ImportError:
            print("wandb not available; WandbLogger falling back to in-memory history")
            self._wandb = None
            self._fallback = ListLogger()
        self.iter = 0

    def write(self, data: LoggingData) -> None:
        if self._wandb is None:
            self._fallback.write(data)
        else:
            self.run.log(data, step=self.iter, commit=False)
        self.iter += 1

    def close(self) -> None:
        if self._wandb is None:
            self._fallback.close()
        else:
            self.run.finish()


def setup_logger(logger_cfg: Mapping[str, Any], save_dir: str = ".", save: bool = True) -> Logger:
    """Select a logger by which key is present in the config section.

    Parity: reference `ecnf/utils/setup_train_objects.py:5-17`.
    """
    if logger_cfg is None:
        return ListLogger()
    if "wandb" in logger_cfg:
        return WandbLogger(**(logger_cfg["wandb"] or {}))
    if "list_logger" in logger_cfg:
        return ListLogger()
    if "pandas_logger" in logger_cfg or "csv_logger" in logger_cfg:
        section = logger_cfg.get("pandas_logger") or logger_cfg.get("csv_logger") or {}
        return CSVLogger(
            save=save,
            save_path=save_dir,
            save_period=int(section.get("save_period", 100)),
        )
    raise ValueError(
        "No logger specified: add one of wandb / list_logger / pandas_logger "
        "to the logger config section."
    )
