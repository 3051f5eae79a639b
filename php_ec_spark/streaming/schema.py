"""Minimal JSON-Schema validation for action parameters (S8).

The reference validates action params against a full JSON-Schema document
before dispatch (ActionExecutionCoordinator.php:230-239,
register_action:87-91). The container ships no jsonschema package, so
this implements the practically-used subset in pure Python:

``type`` (single or list; object/array/string/number/integer/boolean/
null), ``properties``, ``required``, ``additionalProperties`` (bool),
``items`` (single schema), ``enum``, ``const``, ``minimum``/``maximum``,
``minLength``/``maxLength``, ``minItems``/``maxItems``, ``pattern``.

:func:`validate_json_schema` returns a list of error strings (empty =
valid) — callers raise, mirroring the reference's argumenterror path.
"""

from __future__ import annotations

import re
from typing import Any

_TYPE_CHECKS = {
    "object": lambda v: isinstance(v, dict),
    "array": lambda v: isinstance(v, (list, tuple)),
    "string": lambda v: isinstance(v, str),
    "number": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "integer": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "boolean": lambda v: isinstance(v, bool),
    "null": lambda v: v is None,
}


def validate_json_schema(instance: Any, schema: dict, path: str = "$") -> list[str]:
    """Validate ``instance`` against the JSON-Schema subset; returns error
    strings with JSONPath-ish locations (empty list = valid)."""
    errors: list[str] = []
    if not isinstance(schema, dict):
        return [f"{path}: schema must be an object"]

    typ = schema.get("type")
    if typ is not None:
        types = typ if isinstance(typ, list) else [typ]
        unknown = [t for t in types if t not in _TYPE_CHECKS]
        if unknown:
            return [f"{path}: unknown schema type(s) {unknown}"]
        if not any(_TYPE_CHECKS[t](instance) for t in types):
            return [f"{path}: expected type {typ}, got {type(instance).__name__}"]

    if "enum" in schema and instance not in schema["enum"]:
        errors.append(f"{path}: {instance!r} not in enum {schema['enum']!r}")
    if "const" in schema and instance != schema["const"]:
        errors.append(f"{path}: {instance!r} != const {schema['const']!r}")

    if isinstance(instance, str):
        if "minLength" in schema and len(instance) < schema["minLength"]:
            errors.append(f"{path}: shorter than minLength {schema['minLength']}")
        if "maxLength" in schema and len(instance) > schema["maxLength"]:
            errors.append(f"{path}: longer than maxLength {schema['maxLength']}")
        if "pattern" in schema and not re.search(schema["pattern"], instance):
            errors.append(f"{path}: does not match pattern {schema['pattern']!r}")

    if isinstance(instance, (int, float)) and not isinstance(instance, bool):
        if "minimum" in schema and instance < schema["minimum"]:
            errors.append(f"{path}: {instance} < minimum {schema['minimum']}")
        if "maximum" in schema and instance > schema["maximum"]:
            errors.append(f"{path}: {instance} > maximum {schema['maximum']}")

    if isinstance(instance, dict):
        props = schema.get("properties", {})
        for name in schema.get("required", []):
            if name not in instance:
                errors.append(f"{path}: missing required property {name!r}")
        for name, sub in props.items():
            if name in instance:
                errors.extend(
                    validate_json_schema(instance[name], sub, f"{path}.{name}")
                )
        if schema.get("additionalProperties") is False:
            extra = set(instance) - set(props)
            if extra:
                errors.append(f"{path}: additional properties {sorted(extra)}")

    if isinstance(instance, (list, tuple)):
        if "minItems" in schema and len(instance) < schema["minItems"]:
            errors.append(f"{path}: fewer than minItems {schema['minItems']}")
        if "maxItems" in schema and len(instance) > schema["maxItems"]:
            errors.append(f"{path}: more than maxItems {schema['maxItems']}")
        items = schema.get("items")
        if isinstance(items, dict):
            for i, v in enumerate(instance):
                errors.extend(validate_json_schema(v, items, f"{path}[{i}]"))

    return errors
