"""Load the reference's pure-algorithm modules as a parity oracle.

The reference package __init__ imports pdfminer (not installed here), but the
algorithm modules under test (utils/clustering.py, utils/geometry.py,
utils/text.py, table.py) are pure Python over plain dicts. We register a
minimal synthetic package so the leaf modules import without executing
pdfplumber/__init__.py. Reference code is NEVER shipped — this module is
test-only and reads from the read-only reference checkout.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference/pdfplumber"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Returns (clustering, geometry, text, table) reference modules."""
    if "refplumber.table" in sys.modules:
        return (
            sys.modules["refplumber.utils.clustering"],
            sys.modules["refplumber.utils.geometry"],
            sys.modules["refplumber.utils.text"],
            sys.modules["refplumber.table"],
        )
    pkg = types.ModuleType("refplumber")
    pkg.__path__ = [REF]
    sys.modules["refplumber"] = pkg
    _load("refplumber._typing", f"{REF}/_typing.py")
    upkg = types.ModuleType("refplumber.utils")
    upkg.__path__ = [f"{REF}/utils"]
    sys.modules["refplumber.utils"] = upkg
    _load("refplumber.utils.generic", f"{REF}/utils/generic.py")
    clustering = _load("refplumber.utils.clustering", f"{REF}/utils/clustering.py")
    geometry = _load("refplumber.utils.geometry", f"{REF}/utils/geometry.py")
    text = _load("refplumber.utils.text", f"{REF}/utils/text.py")
    # table.py does `from . import utils` and uses utils.<fn>; wire the names
    for mod in (clustering, geometry, text):
        for k in dir(mod):
            if not k.startswith("_"):
                setattr(upkg, k, getattr(mod, k))
    pkg.utils = upkg
    table = _load("refplumber.table", f"{REF}/table.py")
    return clustering, geometry, text, table
