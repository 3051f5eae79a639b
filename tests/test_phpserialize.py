"""Decoder units for the pre-2022 PHP serialize() format.

The four specimen strings are VERBATIM from the reference repo's
tests_adhoc/74_unserialisation.php — genuine output of the PHP engine's
serializers (Event.php:172-175 C:json shape, __serialize O: shape), so
these tests pin the decoder to bytes the reference actually produced.
"""

from __future__ import annotations

import math

import pytest

from php_ec_spark.phpserialize import PhpObject, PhpSerializeError, loads

EVENT_C = (
    'C:38:"EdgeTelemetrics\\EventCorrelation\\Event":82:'
    '{{"id":null,"event":"Test:Event:Single",'
    '"datetime":"2021-05-31T14:00:00.000+00:00"}}'
)
EVENT_O = (
    'O:38:"EdgeTelemetrics\\EventCorrelation\\Event":3:'
    '{s:2:"id";N;s:5:"event";s:17:"Test:Event:Single";'
    's:8:"datetime";s:29:"2021-05-31T14:00:00.000+00:00";}'
)
MATCHER_C = (
    'C:69:"EdgeTelemetrics\\EventCorrelation\\tests\\Rules\\'
    'MatchOneRuleContinuously":117:'
    '{{"events":["00000000000000060000000000000000"],"id":"95051be938",'
    '"actionFired":false,"isTimedOut":false,"context":[]}}'
)
MATCHER_O = (
    'O:69:"EdgeTelemetrics\\EventCorrelation\\tests\\Rules\\'
    'MatchOneRuleContinuously":5:'
    '{s:6:"events";a:1:{i:0;s:32:"00000000000000060000000000000000";}'
    's:2:"id";s:10:"675291bc6f";s:11:"actionFired";b:0;'
    's:10:"isTimedOut";b:0;s:7:"context";a:0:{}}'
)


class TestGenuineSpecimens:
    def test_event_c_and_o_decode_identically(self):
        c, o = loads(EVENT_C), loads(EVENT_O)
        assert isinstance(c, PhpObject) and isinstance(o, PhpObject)
        assert c.php_class == o.php_class
        assert c.fields == o.fields == {
            "id": None,
            "event": "Test:Event:Single",
            "datetime": "2021-05-31T14:00:00.000+00:00",
        }

    def test_matcher_c(self):
        m = loads(MATCHER_C)
        assert m.php_class.endswith("MatchOneRuleContinuously")
        assert m.fields["events"] == ["00000000000000060000000000000000"]
        assert m.fields["actionFired"] is False

    def test_matcher_o(self):
        m = loads(MATCHER_O)
        assert m.fields["events"] == ["00000000000000060000000000000000"]
        assert m.fields["id"] == "675291bc6f"
        # a:0:{} decodes to an empty list (PHP arrays are ambiguous empty)
        assert m.fields["context"] in ([], {})


class TestValueGrammar:
    @pytest.mark.parametrize(
        "blob,want",
        [
            ("N;", None),
            ("b:1;", True),
            ("b:0;", False),
            ("i:-42;", -42),
            ("d:1.5;", 1.5),
            ('s:5:"héllo";'.replace("5", "6"), "héllo"),  # byte-counted
            ("a:2:{i:0;i:10;i:1;i:20;}", [10, 20]),
            ('a:1:{s:3:"key";s:3:"val";}', {"key": "val"}),
            ("a:2:{i:1;i:10;i:0;i:20;}", {1: 10, 0: 20}),  # not 0..n-1 order
        ],
    )
    def test_scalars_and_arrays(self, blob, want):
        assert loads(blob) == want

    def test_double_specials(self):
        assert loads("d:INF;") == math.inf
        assert loads("d:-INF;") == -math.inf
        assert math.isnan(loads("d:NAN;"))

    def test_private_property_name_unmangled(self):
        # protected props serialize as "\0*\0name", private as "\0Cls\0name"
        blob = 'O:1:"X":1:{s:5:"\x00*\x00ts";i:5;}'
        assert loads(blob).fields == {"ts": 5}

    @pytest.mark.parametrize(
        "blob",
        [
            "garbage",
            'O:8:"stdClass"',          # truncated
            "i:12",                    # missing terminator
            's:5:"ab";',               # wrong byte count
            "R:1;",                    # references unsupported
            'C:3:"Foo":7:{not-js}',    # C payload not JSON
            "a:1:{d:1.0;i:1;}",        # float array key
            "i:1;i:2;",                # trailing bytes
        ],
    )
    def test_malformed_raises(self, blob):
        with pytest.raises(PhpSerializeError):
            loads(blob)


def _php_dumps(v) -> str:
    """Test-side PHP serialize() WRITER (the library is decode-only): the
    exact format PHP emits, used to round-trip arbitrary values through
    the decoder."""
    if v is None:
        return "N;"
    if isinstance(v, bool):
        return f"b:{1 if v else 0};"
    if isinstance(v, int):
        return f"i:{v};"
    if isinstance(v, float):
        return f"d:{v!r};"
    if isinstance(v, str):
        return f's:{len(v.encode("utf-8"))}:"{v}";'
    if isinstance(v, list):
        items = "".join(
            _php_dumps(i) + _php_dumps(x) for i, x in enumerate(v)
        )
        return f"a:{len(v)}:{{{items}}}"
    if isinstance(v, dict):
        items = "".join(_php_dumps(k) + _php_dumps(x) for k, x in v.items())
        return f"a:{len(v)}:{{{items}}}"
    raise TypeError(type(v))


class TestRoundTripFuzz:
    def test_fuzz_decode_inverts_encode(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        scalars = st.one_of(
            st.none(),
            st.booleans(),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",)  # no lone surrogates
                ),
                max_size=20,
            ),
        )
        values = st.recursive(
            scalars,
            lambda child: st.one_of(
                st.lists(child, max_size=5),
                st.dictionaries(
                    st.text(
                        alphabet=st.characters(blacklist_categories=("Cs",)),
                        max_size=8,
                    ),
                    child,
                    max_size=5,
                ),
            ),
            max_leaves=20,
        )

        @settings(max_examples=300, deadline=None)
        @given(values)
        def check(v):
            got = loads(_php_dumps(v))
            # one representational ambiguity: PHP's empty array decodes
            # as [] whether the source was a list or a dict
            def norm(x):
                if isinstance(x, dict):
                    return {k: norm(val) for k, val in x.items()} if x else []
                if isinstance(x, list):
                    return [norm(i) for i in x]
                return x

            assert got == norm(v)

        check()
