from .base import (
    EVENT_MATCH_ANY,
    Rule,
    match_single,
    match_single_continuously,
    parse_duration,
    sequence_rule,
)

__all__ = [
    "EVENT_MATCH_ANY",
    "Rule",
    "match_single",
    "match_single_continuously",
    "parse_duration",
    "sequence_rule",
]
