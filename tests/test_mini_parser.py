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
