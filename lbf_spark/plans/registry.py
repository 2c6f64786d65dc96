"""Named-stage registry with config validation — the distributed
restatement of the reference's extensibility story: the pluggy hookspec
registry (``/root/reference/src/lbfextract/hookspecs.py:26-135``, one
named hook per pipeline stage, caller-overridable) plus the voluptuous
per-stage config schemas (``fextract/schemas.py:28-117``, coercing
validators with named error messages).

Here a *stage* is a named transformation over DataFrames with a typed
config dataclass. The registry ships the reference's fixed stages
(event_features → point_in_time / matrix → summary → vectors) and
accepts user registrations (the hookimpl analog); ``extract_features``
/ ``run_pipeline`` accept a ``stages={name: override}`` mapping exactly
like a pluggy plugin overriding one hook while the rest default.

Config validation mirrors ``schemas.Config``: values are *coerced* to
the dataclass field types (int/float/str/bool, "2000" → 2000), unknown
keys and uncoercible values raise ``InvalidStageConfigError`` naming
the stage, the field, and the expected type — the
``LbfextractInvalidConfigError`` analog (``fextract/schemas.py:39-41``).
"""

from __future__ import annotations

import dataclasses
import typing
from collections.abc import Callable


class InvalidStageConfigError(ValueError):
    """Raised when a stage config fails validation (the
    LbfextractInvalidConfigError analog)."""

    def __init__(self, stage: str, field: str | None, message: str):
        self.stage, self.field = stage, field
        where = f"{stage}.{field}" if field else stage
        super().__init__(f"invalid config for stage '{where}': {message}")


_COERCIBLE = {int: int, float: float, str: str, bool: bool}


def _unwrap_optional(tp):
    import types

    origin = typing.get_origin(tp)
    if origin is typing.Union or origin is types.UnionType:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0], True
    return tp, False


def validate_config(stage: str, config_cls: type, values: dict) -> object:
    """Coerce + validate ``values`` into a ``config_cls`` instance.

    - unknown keys → error listing the allowed fields
    - values are coerced to the annotated type where safe (voluptuous
      Coerce analog); failures name the field and expected type
    - missing keys fall back to the dataclass defaults
    """
    if not dataclasses.is_dataclass(config_cls):
        raise TypeError(f"{config_cls!r} is not a dataclass")
    fields = {f.name: f for f in dataclasses.fields(config_cls)}
    hints = typing.get_type_hints(config_cls)
    unknown = sorted(set(values) - set(fields))
    if unknown:
        raise InvalidStageConfigError(
            stage, None,
            f"unknown keys {unknown}; allowed: {sorted(fields)}",
        )
    coerced = {}
    for k, v in values.items():
        tp, is_opt = _unwrap_optional(hints.get(k, type(v)))
        if v is None:
            if not is_opt:
                raise InvalidStageConfigError(stage, k, "may not be null")
            coerced[k] = None
            continue
        caster = _COERCIBLE.get(tp)
        if tp in (int, float) and isinstance(v, bool):
            raise InvalidStageConfigError(
                stage, k, f"expected {tp.__name__}, got bool {v!r}"
            )
        if caster is None or isinstance(v, tp):
            coerced[k] = v
            continue
        if tp is bool and not isinstance(v, bool):
            raise InvalidStageConfigError(
                stage, k, f"expected bool, got {type(v).__name__} {v!r}"
            )
        if tp is int and isinstance(v, float) and v != int(v):
            raise InvalidStageConfigError(
                stage, k, f"expected int, got non-integral float {v!r}"
            )
        try:
            coerced[k] = caster(v)
        except (TypeError, ValueError) as e:
            raise InvalidStageConfigError(
                stage, k,
                f"expected {tp.__name__}, got {type(v).__name__} {v!r}",
            ) from e
    try:
        return config_cls(**coerced)
    except (TypeError, ValueError) as e:
        raise InvalidStageConfigError(stage, None, str(e)) from e


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """One named pipeline stage (the hookspec analog)."""

    name: str
    fn: Callable
    config_cls: type | None = None
    description: str = ""


STAGES: dict[str, StageSpec] = {}


def register_stage(
    name: str,
    fn: Callable,
    config_cls: type | None = None,
    description: str = "",
    replace: bool = False,
) -> StageSpec:
    """Register a stage (hookimpl analog). ``replace=True`` overrides an
    existing registration — the pluggy firstresult semantics."""
    if name in STAGES and not replace:
        raise ValueError(
            f"stage '{name}' already registered (pass replace=True to override)"
        )
    spec = StageSpec(name, fn, config_cls, description)
    STAGES[name] = spec
    return spec


def get_stage(name: str) -> StageSpec:
    if name not in STAGES:
        raise KeyError(
            f"unknown stage '{name}'; registered: {sorted(STAGES)}"
        )
    return STAGES[name]


def resolve_stages(overrides: dict[str, Callable | str] | None) -> dict[str, Callable]:
    """Resolve a {stage: callable-or-registered-name} override mapping
    against the registry; unknown stage names are an error."""
    out = {}
    for name, impl in (overrides or {}).items():
        if name not in STAGES:
            raise KeyError(
                f"cannot override unknown stage '{name}'; registered: {sorted(STAGES)}"
            )
        out[name] = get_stage(impl).fn if isinstance(impl, str) else impl
    return out


def _register_defaults() -> None:
    """The reference's fixed hook pipeline (core.py:263-298), one
    StageSpec per stage, all configured by FeatureConfig."""
    from lbf_spark.plans import pipeline as P

    if "event_features" in STAGES:
        return
    register_stage(
        "event_features", P.event_features, P.FeatureConfig,
        "decode + per-entity windowed features (transform_reads analog)",
    )
    register_stage(
        "point_in_time", P.anchor_point_in_time, P.FeatureConfig,
        "as-of join of features onto anchors (fetch_reads analog)",
    )
    register_stage(
        "matrix", P.anchor_window_matrix, P.FeatureConfig,
        "positional coverage matrix + flanking normalization "
        "(transform_single_intervals analog)",
    )
    register_stage(
        "summary", P.summarize, P.FeatureConfig,
        "cross-anchor summary (transform_all_intervals analog)",
    )


_register_defaults()
