"""Named-section stopwatch with ETA (reference utils/timer.py:1-31)."""

from __future__ import annotations

import datetime
import time
from collections import OrderedDict


class Timer:
    def __init__(self):
        self.start = time.time()
        self.reset_timer()

    def reset_timer(self):
        self.before = time.time()
        self.timer: "OrderedDict[str, float]" = OrderedDict()

    def update_time(self, key: str):
        now = time.time()
        self.timer[key] = now - self.before
        self.before = now

    def to_string(self, iters_left: int, short: bool = False) -> str:
        iter_total = sum(self.timer.values())
        msg = "{:%Y-%m-%d %H:%M:%S}\tElapse: {}\tTimeLeft: {}\t".format(
            datetime.datetime.now(),
            datetime.timedelta(seconds=round(time.time() - self.start)),
            datetime.timedelta(seconds=round(iter_total * max(iters_left, 0))),
        )
        if short:
            msg += "{}: {:.2f}s".format("|".join(self.timer.keys()), iter_total)
        else:
            msg += "\tIterTotal: {:.2f}s\t{}: {}  ".format(
                iter_total, "|".join(self.timer.keys()),
                " ".join(f"{x:.2f}s" for x in self.timer.values()))
        return msg
