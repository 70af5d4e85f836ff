"""Finite-difference shape checks, porting the reference's assertion style
(/root/reference/test/utils/utils.cc:63-91): a sequence is 'constant' when
its stddev < 1.0; 'linear' when its first differences are constant;
'quadratic' when its second differences are constant."""

from __future__ import annotations

import math


def diff(seq: list[float]) -> list[float]:
    return [b - a for a, b in zip(seq, seq[1:])]


def check_constant(seq: list[float]) -> bool:
    avg = sum(seq) / len(seq)
    var = sum((x - avg) ** 2 for x in seq) / len(seq)
    return math.sqrt(var) < 1.0


def check_linear(seq: list[float]) -> bool:
    return check_constant(diff(seq))


def check_quadratic(seq: list[float]) -> bool:
    return check_linear(diff(seq))
