"""Micro-stub of the chainer API surface used by the reference's model
modules (Reporter base class + reporter.report no-op)."""
from types import SimpleNamespace


class Chain:
    def __init__(self, *a, **kw):
        pass


class Link:
    pass


def report(values, observer=None):
    pass


reporter = SimpleNamespace(report=report)
