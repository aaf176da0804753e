"""Example user process — the reference's test/example_process.py:4-13
shape: an ``execute(mp, **params)`` returning a masked array."""


def execute(mp, multiplier=1.0, offset=0.0):
    """Scale and offset the input tile."""
    return mp.array * multiplier + offset
