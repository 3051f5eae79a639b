"""Minimal decoder for PHP's ``serialize()`` wire format (pre-2022 save
files).

Pre-2022 php-ec save files store matchers and events as PHP
``serialize()`` strings instead of plain JSON (CorrelationEngine.php:
688-696; genuine engine-produced specimens of both shapes are committed
in the reference repo at tests_adhoc/74_unserialisation.php). Two shapes
occur:

- ``C:len:"Class":len:{payload}`` — classes implementing the
  ``Serializable`` interface. For both ``Event`` (Event.php:172-175) and
  the rule state machines the payload is ``json_encode`` output, so the
  payload parses with a JSON parser.
- ``O:len:"Class":n:{k;v;...}`` — standard object serialization of the
  ``__serialize()`` dict: the same fields, in the native PHP format.

This module implements the (public, well-documented) value grammar those
shapes need: ``N`` null, ``b`` bool, ``i`` int, ``d`` double, ``s``
string (byte-counted), ``a`` array (returned as a list when the keys are
exactly 0..n-1, else a dict), plus the two object forms above. It is a
decoder only — the Spark engine never needs to WRITE PHP serialization.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Tuple

__all__ = ["PhpObject", "loads", "PhpSerializeError"]


class PhpSerializeError(ValueError):
    """Input is not valid PHP serialize() output (or uses an unsupported
    construct, e.g. references or enums)."""


@dataclass
class PhpObject:
    """A decoded ``O:``/``C:`` object: PHP class name + field dict."""

    php_class: str
    fields: dict


def loads(data: str | bytes) -> Any:
    """Decode one serialized PHP value. Raises PhpSerializeError on any
    malformed or unsupported input — callers count-and-skip on failure."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    try:
        value, pos = _parse(data, 0)
    except (
        IndexError,
        ValueError,  # covers int()/index() misses and JSONDecodeError
        UnicodeDecodeError,
    ) as e:
        raise PhpSerializeError(str(e)) from e
    if data[pos:].strip():
        raise PhpSerializeError(f"trailing bytes at offset {pos}")
    return value


def _expect(data: bytes, pos: int, token: bytes) -> int:
    if data[pos : pos + len(token)] != token:
        raise PhpSerializeError(
            f"expected {token!r} at offset {pos}, got "
            f"{data[pos:pos + len(token)]!r}"
        )
    return pos + len(token)


def _read_int_until(data: bytes, pos: int, stop: bytes) -> Tuple[int, int]:
    end = data.index(stop, pos)
    return int(data[pos:end]), end + 1


def _read_counted_str(data: bytes, pos: int) -> Tuple[str, int]:
    """``LEN:"BYTES"`` — LEN counts BYTES, not characters."""
    n, pos = _read_int_until(data, pos, b":")
    pos = _expect(data, pos, b'"')
    raw = data[pos : pos + n]
    if len(raw) != n:
        raise PhpSerializeError("truncated string")
    pos = _expect(data, pos + n, b'"')
    return raw.decode("utf-8"), pos


def _parse(data: bytes, pos: int) -> Tuple[Any, int]:
    tag = data[pos : pos + 1]
    if tag == b"N":
        return None, _expect(data, pos, b"N;")
    if tag == b"b":
        pos = _expect(data, pos, b"b:")
        v = data[pos : pos + 1]
        if v not in (b"0", b"1"):
            raise PhpSerializeError(f"bad bool at {pos}")
        return v == b"1", _expect(data, pos + 1, b";")
    if tag == b"i":
        pos = _expect(data, pos, b"i:")
        v, pos = _read_int_until(data, pos, b";")
        return v, pos
    if tag == b"d":
        pos = _expect(data, pos, b"d:")
        end = data.index(b";", pos)
        txt = data[pos:end].decode("ascii")
        low = txt.lower()
        v = (
            float("nan") if low == "nan"
            else float("inf") if low == "inf"
            else float("-inf") if low == "-inf"
            else float(txt)
        )
        return v, end + 1
    if tag == b"s":
        pos = _expect(data, pos, b"s:")
        v, pos = _read_counted_str(data, pos)
        return v, _expect(data, pos, b";")
    if tag == b"a":
        pos = _expect(data, pos, b"a:")
        n, pos = _read_int_until(data, pos, b":")
        pos = _expect(data, pos, b"{")
        out: dict = {}
        for _ in range(n):
            k, pos = _parse(data, pos)
            if not isinstance(k, (int, str)):
                raise PhpSerializeError("array key must be int or string")
            out[k], pos = _parse(data, pos)
        pos = _expect(data, pos, b"}")
        # a PHP array with keys exactly 0..n-1 is a list; PHP's empty
        # array is ambiguous and decodes as [] (json_encode agrees)
        if all(k == i for i, k in enumerate(out)):
            return list(out.values()), pos
        return out, pos
    if tag == b"O":
        pos = _expect(data, pos, b"O:")
        cls, pos = _read_counted_str(data, pos)
        pos = _expect(data, pos, b":")
        n, pos = _read_int_until(data, pos, b":")
        pos = _expect(data, pos, b"{")
        fields: dict = {}
        for _ in range(n):
            k, pos = _parse(data, pos)
            if not isinstance(k, str):
                raise PhpSerializeError("object property name must be string")
            # private/protected props serialize with "\0Class\0" /
            # "\0*\0" name prefixes — strip to the visible name
            if "\x00" in k:
                k = k.rsplit("\x00", 1)[-1]
            fields[k], pos = _parse(data, pos)
        return PhpObject(cls, fields), _expect(data, pos, b"}")
    if tag == b"C":
        pos = _expect(data, pos, b"C:")
        cls, pos = _read_counted_str(data, pos)
        pos = _expect(data, pos, b":")
        n, pos = _read_int_until(data, pos, b":")
        pos = _expect(data, pos, b"{")
        payload = data[pos : pos + n]
        if len(payload) != n:
            raise PhpSerializeError("truncated C-payload")
        pos = _expect(data, pos + n, b"}")
        # php-ec Serializable payloads are json_encode output (Event.php:
        # 172-175); non-JSON payloads are foreign Serializable classes we
        # cannot interpret
        fields = json.loads(payload.decode("utf-8"))
        if not isinstance(fields, dict):
            raise PhpSerializeError("C-payload is not a JSON object")
        return PhpObject(cls, fields), pos
    raise PhpSerializeError(f"unsupported tag {tag!r} at offset {pos}")
