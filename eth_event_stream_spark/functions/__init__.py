from .schema import EventParam, EventSchema, event_schema, parse_event_declaration  # noqa: F401
from .keccak import keccak256, keccak256_hex  # noqa: F401
