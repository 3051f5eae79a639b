from .batch import EMISSION_SCHEMA, correlate, correlate_state_machine
from .relational import compile_two_step_sequence

__all__ = [
    "EMISSION_SCHEMA",
    "correlate",
    "correlate_state_machine",
    "compile_two_step_sequence",
]
