"""Examples stay importable (anti-rot guard).

Full example runs are exercised ad hoc (`scripts/run_examples.py`) and in
targeted tests (`test_detection_serving_example`,
`test_preemptible_training`); importing every example module here catches
renamed/removed APIs, bad imports, and syntax errors cheaply on every
suite run — the most common way examples rot.
"""

import importlib
import os
import sys

import pytest

_EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)
_MODULES = sorted(
    f[:-3]
    for f in os.listdir(_EXAMPLES)
    if f.endswith(".py") and not f.startswith("_")
)


@pytest.mark.parametrize("module", _MODULES)
def test_example_imports(module):
    sys.path.insert(0, _EXAMPLES)
    try:
        mod = importlib.import_module(module)
        # every example is a script with a main guard: importing must be
        # side-effect-light and expose a callable entry point
        assert hasattr(mod, "main") or hasattr(mod, "run"), (
            f"{module} has no main()/run() entry point"
        )
    finally:
        sys.path.remove(_EXAMPLES)
