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

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_EXAMPLES = os.path.join(_REPO, "examples")
sys.path.insert(0, os.path.join(_REPO, "scripts"))
from run_examples import discover_examples  # noqa: E402 - shared discovery

_MODULES = discover_examples(_EXAMPLES)


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
