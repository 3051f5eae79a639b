"""Event-chain accessors for rule callbacks (SURVEY A6).

The reference exposes getFirstEvent/getLastEvent/getEventOfType over a
matcher's consumed chain (AEventProcessor.php:276-315). Our callbacks
(``on_complete``/``on_timeout``/``accept``) receive the chain as a list of
event dicts ``{event_id, ts_ns, event_type, value}`` in consumption order;
these helpers mirror the reference accessors over that shape.
"""

from __future__ import annotations

from typing import Optional, Sequence


def first_event(chain: Sequence[dict]) -> Optional[dict]:
    """getFirstEvent (AEventProcessor.php:276-284)."""
    return chain[0] if chain else None


def last_event(chain: Sequence[dict]) -> Optional[dict]:
    """getLastEvent (AEventProcessor.php:286-294)."""
    return chain[-1] if chain else None


def events_of_type(chain: Sequence[dict], event_type: str) -> list[dict]:
    """getEventOfType, all occurrences (AEventProcessor.php:296-315)."""
    return [e for e in chain if e["event_type"] == event_type]


def first_event_of_type(chain: Sequence[dict], event_type: str) -> Optional[dict]:
    evs = events_of_type(chain, event_type)
    return evs[0] if evs else None


def chain_value_sum(chain: Sequence[dict]) -> Optional[float]:
    vals = [e["value"] for e in chain if e.get("value") is not None]
    return float(sum(vals)) if vals else None


def chain_duration_s(chain: Sequence[dict]) -> Optional[float]:
    """Seconds between first and last consumed event."""
    if len(chain) < 2:
        return 0.0 if chain else None
    return (chain[-1]["ts_ns"] - chain[0]["ts_ns"]) / 1e9
