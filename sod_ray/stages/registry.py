"""User-extension surface (SURVEY.md §2.7): a constraint/scorer plugin
registry — the engine's analog of the reference's predictor factory +
env-selected algorithm dispatch (/root/reference/internal/predictor/
predictor.go:20-34 ``ProvideFn``; setup.go:188-216).

A constraint plugin implements the partial/merge/finalize/verdict
protocol; ``map_batches`` runs ``partial`` per Arrow batch, a groupby
merges, ``verdict`` turns the merged state into pass/fail + evidence.
Registered classes are selected by name in ValidateConfig-style
configs (the SOD_PREDICTOR_TYPE analog).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable


@runtime_checkable
class Constraint(Protocol):
    """accumulate(batch)→state; merge(state,state)→state;
    verdict(state)→(passed: bool, evidence: dict)."""

    name: str

    def partial(self, batch): ...

    def merge(self, a, b): ...

    def verdict(self, state) -> tuple[bool, dict]: ...


_REGISTRY: dict[str, type] = {}


def register(cls=None, *, name: str | None = None):
    """Class decorator: @register or @register(name="null_rate")."""

    def apply(c):
        key = name or getattr(c, "name", c.__name__)
        _REGISTRY[key] = c
        return c

    return apply(cls) if cls is not None else apply


def get(name: str) -> type:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown constraint {name!r}; registered: {sorted(_REGISTRY)}"
        )  # mirrors NNFor/DistanceFuncFor unknown-type errors (lof/config.go:23-62)


def available() -> list[str]:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# Built-ins registered for name-based selection
# ---------------------------------------------------------------------------


@register(name="null_rate")
class NullRateConstraint:
    name = "null_rate"

    def __init__(self, column: str, max_rate: float = 0.01):
        self.column = column
        self.max_rate = max_rate

    def partial(self, batch):
        col = batch[self.column]
        return {"nulls": col.null_count, "total": len(batch)}

    def merge(self, a, b):
        return {"nulls": a["nulls"] + b["nulls"], "total": a["total"] + b["total"]}

    def verdict(self, state):
        rate = state["nulls"] / state["total"] if state["total"] else 0.0
        return rate <= self.max_rate, {"null_rate": rate, **state}


@register(name="uniqueness")
class UniquenessConstraint:
    name = "uniqueness"

    def __init__(self, column: str, max_dup_rate: float = 0.005):
        from ..state.sketches import HyperLogLog

        self.column = column
        self.max_dup_rate = max_dup_rate
        self._hll_cls = HyperLogLog

    def partial(self, batch):
        hll = self._hll_cls().update_array(batch[self.column])
        return {"hll": hll.to_bytes(), "rows": len(batch)}

    def merge(self, a, b):
        ha = self._hll_cls.from_bytes(a["hll"])
        ha.merge(self._hll_cls.from_bytes(b["hll"]))
        return {"hll": ha.to_bytes(), "rows": a["rows"] + b["rows"]}

    def verdict(self, state):
        est = self._hll_cls.from_bytes(state["hll"]).cardinality()
        dup_est = max(0.0, state["rows"] - est)
        ok = dup_est <= self.max_dup_rate * max(state["rows"], 1)
        return ok, {"distinct_est": est, "dup_est": dup_est, "rows": state["rows"]}


def run_constraint(ds, constraint) -> tuple[bool, dict]:
    """Execute one plugin over a Dataset: map_batches partials → fold on
    the driver (partials are tiny dicts — one per batch)."""
    import pyarrow as pa

    def as_rows(batch: pa.Table) -> pa.Table:
        import pickle

        return pa.table({"state": pa.array([pickle.dumps(constraint.partial(batch))])})

    import pickle

    states = [
        pickle.loads(r["state"])
        for r in ds.map_batches(as_rows, batch_format="pyarrow").take_all()
    ]
    if not states:
        return True, {}
    merged = states[0]
    for s in states[1:]:
        merged = constraint.merge(merged, s)
    return constraint.verdict(merged)
