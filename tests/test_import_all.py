"""Import every module in the package (reference ci/test_import_all.py).

Catches syntax errors, broken imports, and circular dependencies anywhere
in the tree — including modules no other test touches.
"""
import importlib
import pkgutil

import espnet_slurp_tpu


def test_import_all_modules():
    failures = []
    for mod in pkgutil.walk_packages(espnet_slurp_tpu.__path__,
                                     prefix="espnet_slurp_tpu."):
        name = mod.name
        if name.rsplit(".", 1)[-1].startswith("_"):
            continue  # compiled ctypes artifacts (_wavio.so etc.)
        try:
            importlib.import_module(name)
        except Exception as e:  # noqa: BLE001 - report every failure
            failures.append((name, repr(e)))
    assert not failures, failures
