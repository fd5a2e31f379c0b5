"""Metric accumulators (reference utils.py:135-168)."""
from __future__ import annotations


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(1, self.count)


def init_losses(loss_str: str):
    meters = {}
    for term in loss_str.split("+"):
        _w, loss_type = term.split("*")
        meters[loss_type] = AverageMeter()
    meters["total"] = AverageMeter()
    return meters


def init_meters(loss_str: str):
    return init_losses(loss_str), AverageMeter(), AverageMeter(), AverageMeter()
