"""Grouped-input mean, mirroring the reference's
examples/file_groups/file_groups.py."""

import numpy.ma as ma


def execute(mp, group1, base):
    g1 = ma.mean(ma.stack([arr for _, arr in group1 if arr is not None]), axis=0)
    return ma.mean(ma.stack([g1, base]), axis=0)
