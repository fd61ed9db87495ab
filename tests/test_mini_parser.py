"""Mini-parser unit tests (model: reference
tests/internal_helpers/mini_parser/ lexer + parser tests)."""

import pytest

from accvlab_tpu.pipeline.mini_parser import (
    And,
    Assignment,
    Comparison,
    Lexer,
    Literal,
    Not,
    Or,
    Parser,
    TokenType,
    UnaryMinus,
    Variable,
)


def lex_all(s):
    lexer = Lexer(s)
    tokens = []
    while True:
        t = lexer.next_token()
        tokens.append(t)
        if t.type == TokenType.EOL:
            break
    return tokens


def test_lexer_basic():
    tokens = lex_all("res = a >= 10.5 and not (b == -2)")
    types = [t.type for t in tokens]
    assert types == [
        TokenType.VARIABLE,
        TokenType.ASSIGNMENT,
        TokenType.VARIABLE,
        TokenType.COMPARISON,
        TokenType.LITERAL,
        TokenType.LOGICAL_AND,
        TokenType.LOGICAL_NOT,
        TokenType.PARENTHESIS_OPEN,
        TokenType.VARIABLE,
        TokenType.COMPARISON,
        TokenType.MINUS,
        TokenType.LITERAL,
        TokenType.PARENTHESIS_CLOSE,
        TokenType.EOL,
    ]
    assert tokens[3].value == ">="


def test_lexer_underscore_names():
    tokens = lex_all("_b1 = x_2 < 3")
    assert tokens[0].value == "_b1"
    assert tokens[2].value == "x_2"


def test_lexer_invalid_number():
    with pytest.raises(ValueError):
        lex_all("a = 1.2.3")


def test_parse_simple_comparison():
    ast = Parser("res = a < 10").parse()
    assert isinstance(ast, Assignment)
    assert ast.variable.name == "res"
    assert isinstance(ast.expression, Comparison)
    assert ast.expression.comparison_type == "<"


def test_parse_unary_minus():
    ast = Parser("r = -_b1 < 10.5").parse()
    comp = ast.expression
    assert isinstance(comp, Comparison)
    assert isinstance(comp.val1, UnaryMinus)
    assert isinstance(comp.val1.value, Variable)


def test_parse_precedence_and_or():
    # and binds tighter than or
    ast = Parser("r = a < 1 or b < 2 and c < 3").parse()
    assert isinstance(ast.expression, Or)
    left, right = ast.expression.conditions
    assert isinstance(left, Comparison)
    assert isinstance(right, And)


def test_parse_parentheses():
    ast = Parser("r = (a < 1 or b < 2) and c < 3").parse()
    assert isinstance(ast.expression, And)
    assert isinstance(ast.expression.conditions[0], Or)


def test_parse_chained_and_flattens():
    ast = Parser("r = a < 1 and b < 2 and c < 3").parse()
    assert isinstance(ast.expression, And)
    assert len(ast.expression.conditions) == 3


def test_parse_complex_reference_example():
    # from the reference docstring (parser.py:48)
    ast = Parser(
        "res_5_var = (-_b1 < 10.5 or (-c > -20 and d == 10)) and another_var > 30"
    ).parse()
    assert isinstance(ast.expression, And)


def test_parse_requires_assignment():
    with pytest.raises(ValueError):
        Parser("a < 10").parse()
    with pytest.raises(ValueError):
        Parser("= a < 10").parse()


def test_parse_not():
    ast = Parser("r = not a").parse()
    assert isinstance(ast.expression, Not)
    assert isinstance(ast.expression.condition, Variable)


@pytest.mark.parametrize("seed", range(12))
def test_random_expression_roundtrip(seed):
    """Generate random expression trees, print them fully parenthesized,
    parse, and compare structure via repr — the parser must reproduce any
    tree the grammar can express."""
    import numpy as np

    from accvlab_tpu.pipeline.mini_parser import (
        And,
        Comparison,
        Literal,
        Not,
        Or,
        Parser,
        Variable,
    )

    rng = np.random.default_rng(seed)
    comparisons = ["==", "!=", "<", "<=", ">", ">="]

    def gen(depth):
        roll = rng.random()
        if depth >= 3 or roll < 0.4:
            a = Variable(f"f{rng.integers(0, 4)}")
            b = Literal(str(rng.integers(0, 20)))
            return Comparison(a, comparisons[rng.integers(0, 6)], b)
        if roll < 0.6:
            return Not(gen(depth + 1))
        cls = And if roll < 0.8 else Or
        return cls(gen(depth + 1), gen(depth + 1))

    # attribute names follow the reference AST: And/Or hold *conditions,
    # Not holds .condition

    def stringify(node):
        if isinstance(node, Comparison):
            return f"({stringify(node.val1)} {node.comparison_type} {stringify(node.val2)})"
        if isinstance(node, Not):
            return f"(not {stringify(node.condition)})"
        if isinstance(node, And):
            return "(" + " and ".join(stringify(c) for c in node.conditions) + ")"
        if isinstance(node, Or):
            return "(" + " or ".join(stringify(c) for c in node.conditions) + ")"
        if isinstance(node, Variable):
            return node.name
        return node.value

    def evaluate(node, env):
        if isinstance(node, Comparison):
            a, b = evaluate(node.val1, env), evaluate(node.val2, env)
            return {
                "==": a == b, "!=": a != b, "<": a < b,
                "<=": a <= b, ">": a > b, ">=": a >= b,
            }[node.comparison_type]
        if isinstance(node, Not):
            return not evaluate(node.condition, env)
        if isinstance(node, And):
            return all(evaluate(c, env) for c in node.conditions)
        if isinstance(node, Or):
            return any(evaluate(c, env) for c in node.conditions)
        if isinstance(node, Variable):
            return env[node.name]
        return int(node.value)

    tree = gen(0)
    text = "res = " + stringify(tree)
    parsed = Parser(text).parse()
    # the parser flattens same-operator chains (Or(Or(a,b),c) -> Or(a,b,c)),
    # so compare SEMANTICS: both trees must agree on random assignments
    for _ in range(20):
        env = {f"f{i}": int(rng.integers(0, 21)) for i in range(4)}
        assert evaluate(parsed.expression, env) == evaluate(tree, env), (
            f"{text} disagrees under {env}"
        )
