"""Mini-parser for the annotation-condition DSL.

TPU-native equivalent of the reference
``dali_pipeline_framework/accvlab/.../internal_helpers/mini_parser`` (same
grammar: ``<res_var> = <expression>`` with ``or``/``and``/``not``,
comparisons, unary minus, parentheses, numeric literals). Used by
:class:`~accvlab_tpu.pipeline.processing_steps.AnnotationElementConditionEval`.
"""

from .ast_nodes import AST, And, Assignment, Comparison, Literal, Not, Or, UnaryMinus, Variable
from .lexer import Lexer, Token, TokenType
from .parser import Parser

__all__ = [
    "AST",
    "And",
    "Assignment",
    "Comparison",
    "Lexer",
    "Literal",
    "Not",
    "Or",
    "Parser",
    "Token",
    "TokenType",
    "UnaryMinus",
    "Variable",
]
