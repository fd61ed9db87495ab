"""Differential fuzz: mini-parser DSL vs a Python-eval oracle.

The DSL's grammar (``or``/``and``/``not``, comparisons, unary minus,
parentheses, numeric literals — reference
``internal_helpers/mini_parser``) is a strict subset of Python expression
syntax with matching ``or``/``and``/comparison precedence — the ONE
deviation is ``not``, which binds tighter than comparison in this grammar
(reference contract; pinned below) — so randomly generated condition
strings with ``not``-operands parenthesized can be evaluated both by
``Parser`` + ``AnnotationElementConditionEval._eval`` and by Python's own
``eval`` and must agree. The generator emits parenthesized AND bare
sub-expressions (precedence bugs are exactly what a unit suite of
hand-picked strings misses), and keeps every literal/value a multiple of
0.25 so float32 (DSL) and float64 (oracle) compare identically.
"""

import numpy as np
import pytest

from accvlab_tpu.pipeline import DType, SampleDataGroup
from accvlab_tpu.pipeline.mini_parser import Parser
from accvlab_tpu.pipeline.processing_steps.annotation_element_condition_eval import (
    AnnotationElementConditionEval,
)

_OPS = ["==", "!=", "<", "<=", ">", ">="]


def _gen_num(rng, names):
    r = rng.random()
    if r < 0.4:
        lit = rng.integers(-8, 9) * 0.25
        s = f"{lit}"
        return s if lit >= 0 else f"({s})"  # grammar: no bare leading -3 < x
    name = names[rng.integers(len(names))]
    if r < 0.8:
        return name
    return f"-{name}" if rng.random() < 0.5 else f"(-{name})"


def _gen_bool(rng, names, depth):
    r = rng.random()
    if depth <= 0 or r < 0.45:
        return f"{_gen_num(rng, names)} {_OPS[rng.integers(len(_OPS))]} {_gen_num(rng, names)}"
    if r < 0.6:
        inner = _gen_bool(rng, names, depth - 1)
        # ALWAYS parenthesize: in this grammar `not` binds TIGHTER than
        # comparison (reference parser.py:54-61, LOGICAL_NOT priority 4 vs
        # COMPARISON 3 — deviating from Python, where `not a > b` means
        # `not (a > b)`), so a bare compound operand would diverge from the
        # Python oracle. The deviation itself is pinned by
        # test_not_binds_tighter_than_comparison below.
        return f"not ({inner})"
    op = " and " if r < 0.8 else " or "
    n = int(rng.integers(2, 4))
    parts = []
    for _ in range(n):
        sub = _gen_bool(rng, names, depth - 1)
        # parenthesize randomly — precedence must make the bare form agree
        need = (" or " in sub and op == " and ")
        parts.append(f"({sub})" if (need or rng.random() < 0.4) else sub)
    return op.join(parts)


@pytest.mark.parametrize("seed", range(8))
def test_random_conditions_match_python_eval(seed):
    rng = np.random.default_rng(seed)
    names = ["v0", "v1", "v2", "v3"]
    for trial in range(60):
        env = {n: float(rng.integers(-8, 9) * 0.25) for n in names}
        expr = _gen_bool(rng, names, depth=3)
        cond = f"res = {expr}"

        ann = SampleDataGroup()
        for n in names:
            ann.add_data_field(n, DType.FLOAT)
            ann[n] = np.float32(env[n])
        statement = Parser(cond).parse()
        assert statement.variable.name == "res"
        got = bool(
            np.asarray(
                AnnotationElementConditionEval._eval(ann, statement.expression)
            ).astype(bool)
        )
        want = bool(eval(expr, {"__builtins__": {}}, env))
        assert got == want, f"seed={seed} trial={trial}: {cond!r} env={env}"


@pytest.mark.parametrize("seed", range(3))
def test_random_conditions_elementwise_arrays(seed):
    """Same grammar over PER-OBJECT arrays (the step's real use): the DSL
    evaluates elementwise; the oracle loops objects with scalar eval."""
    rng = np.random.default_rng(100 + seed)
    names = ["a", "b"]
    for trial in range(25):
        k = int(rng.integers(1, 6))
        vals = {n: (rng.integers(-8, 9, k) * 0.25).astype(np.float32) for n in names}
        expr = _gen_bool(rng, names, depth=2)

        ann = SampleDataGroup()
        for n in names:
            ann.add_data_field(n, DType.FLOAT)
            ann[n] = vals[n]
        statement = Parser(f"res = {expr}").parse()
        got = np.asarray(
            AnnotationElementConditionEval._eval(ann, statement.expression)
        ).astype(bool)
        got = np.broadcast_to(got, (k,))
        want = np.array(
            [
                bool(eval(expr, {"__builtins__": {}},
                          {n: float(vals[n][i]) for n in names}))
                for i in range(k)
            ]
        )
        np.testing.assert_array_equal(got, want, err_msg=f"{expr!r} {vals}")


def test_not_binds_tighter_than_comparison():
    """Reference-grammar deviation from Python, pinned: LOGICAL_NOT has
    priority 4 vs COMPARISON 3 (reference mini_parser/parser.py:54-61), so
    ``not a > b`` parses as ``(not a) > b`` — in Python it would be
    ``not (a > b)``. The docstring example ``res = not -_b1 < 10.5``
    relies on exactly this shape."""
    ann = SampleDataGroup()
    for n, v in [("a", 0.25), ("b", 1.0)]:
        ann.add_data_field(n, DType.FLOAT)
        ann[n] = np.float32(v)
    statement = Parser("res = not a > b").parse()
    got = bool(
        np.asarray(
            AnnotationElementConditionEval._eval(ann, statement.expression)
        )
    )
    # (not 0.25) -> False -> 0.0; 0.0 > 1.0 -> False. Python would say True.
    assert got is False
    assert bool(eval("not (0.25 > 1.0)")) is True  # the Python reading
