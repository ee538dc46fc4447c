"""Structural let-binding for Catalyst expression trees.

A PySpark ``Column`` is an expression TREE: every Python-level reference
to an intermediate embeds a full copy of its subtree. Inside higher-order
function lambdas that is catastrophic — HOF lambda bodies are evaluated
interpreted, outside whole-stage codegen's common-subexpression
elimination, so an outer expression referenced from a per-element lambda
is RE-EVALUATED FOR EVERY ELEMENT (round-8 found this in the IPv6 parser
at 57x; round-9 found the same O(len^2) shape in the shingle and token
n-gram expansions, where the token-split regex ran once per gram).

``let_(value, body)`` evaluates ``value`` exactly once per row and hands
``body`` a lambda variable whose references are plain slot reads:
implemented as a single-element-array ``transform`` (HOF arguments are
evaluated once; lambda variables are O(1) reads).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def let_(value: Column, body) -> Column:
    """Bind ``value`` once; evaluate ``body(bound)`` with cheap variable
    references. Semantically identical to inlining ``value`` everywhere
    ``body`` references it (including for null inputs: the bound slot
    holds null and every reference reads the same null)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def is_plan_independent(col: Column) -> bool:
    """True iff ``col``'s tree contains no already-RESOLVED Catalyst
    expression — i.e. it is built purely from unresolved attributes,
    literals and functions, so the identical tree resolves correctly
    against ANY plan with the referenced column names.

    Guard for expression-tree memoization (round 9): a Column taken from
    a DataFrame (``df.ip``) embeds a resolved ``AttributeReference`` with
    a plan-specific exprId, while ``Column.toString()`` — the natural
    memo key — prints it WITHOUT the exprId. Caching such a tree keyed on
    its string re-binds the stale exprId into later plans and fails
    analysis with MISSING_ATTRIBUTES (or, worse, silently reads the
    wrong column in a self-join). Resolved leaves surface in the
    ColumnNode tree as ``ExpressionColumnNode(...)`` wrappers, which a
    purely-unresolved tree never contains."""
    return "ExpressionColumnNode" not in col._jc.node().toString()
