"""Identity process importable by dotted module path (the reference's
``process: mapchete.processes.convert``-style module reference)."""


def execute(mp):
    return mp.array
