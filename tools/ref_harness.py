#!/usr/bin/env python3
"""Import harness for executing the REFERENCE (/root/reference/src) in-sandbox.

The reference's packaging deps (deprecated/fsspec/upath/_version) are not
installed in this container; none of them are touched by the query/eval
code paths we execute, so module stubs satisfy the imports. Dev tooling
only — the shipped Scala engine never imports any of this.

Usage:  from ref_harness import load_reference; npd = load_reference()
"""
import sys
import types


def load_reference():
    if "nested_pandas" in sys.modules:
        return sys.modules["nested_pandas"]
    sys.path.insert(0, "/root/reference/src")

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    stub("nested_pandas._version", __version__="0.0.0")

    def deprecated(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]

        def wrap(f):
            return f

        return wrap

    stub("deprecated", deprecated=deprecated)
    fs = stub("fsspec")
    fs.parquet = stub("fsspec.parquet")

    class UPath:
        def __init__(self, *a, **k):
            raise NotImplementedError("upath stub (no remote IO in-sandbox)")

    stub("upath", UPath=UPath)
    import nested_pandas  # noqa: E402

    return nested_pandas
