"""Operators: the relational capability surface as first-class functions.

The reference exposes exactly one operator pair — user map (flatMap,
mapper.py:41-73) and user reduce over sorted groups (reducer.py:73-93) —
and everything relational is a *pattern* users hand-write inside those
(SURVEY.md §2.2). This package lifts each pattern to a named, Catalyst-
optimizable DataFrame operator.
"""
