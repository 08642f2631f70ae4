"""Session-scoped cache for static Column expression trees.

Several operators rebuild the SAME static expression forest on every
call — the 16-case corner table in the post-passes, simhash's 32 per-bit
vote aggregates, minhash's 16 min-aggregates. Each Column operation is
one py4j round trip (~0.25 ms on this host), so the big builders cost
0.2-0.5 s of pure driver time per query construction, rebuilt per call.

The trees are immutable and resolved by NAME per plan, so reusing one
Column object across plans is exactly the compiled-regex pattern; no
data, no plan, and no result is cached — only expression objects whose
construction is deterministic. Keyed by applicationId so one session's
JVM expression objects are never handed to another session (a fresh
gateway would not know them), and so the cache self-evicts with the app.

Builders must be PURE (no free DataFrame/session state) and each cached
tree must be used at most once per plan — reusing an aliased expression
twice in one plan would duplicate its exprId. Both invariants hold for
every registered builder (they emit column-name→expression dicts applied
with a single ``withColumns``).
"""

from __future__ import annotations

__all__ = ["cached_exprs"]

_CACHE: dict = {}


def cached_exprs(df, tag, build):
    """Return ``build()`` memoized per (applicationId, tag).

    ``df``: any DataFrame of the session (only used to reach the
    SparkContext); ``tag``: hashable key naming the builder + its
    parameters; ``build``: zero-arg callable producing the expressions.
    """
    key = (df.sparkSession.sparkContext.applicationId, tag)
    v = _CACHE.get(key)
    if v is None:
        v = build()
        _CACHE[key] = v
    return v
