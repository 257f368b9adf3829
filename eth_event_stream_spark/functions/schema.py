"""Solidity event-declaration DSL -> Spark schema + canonical signature.

Re-expresses the reference's compile-time pipeline at query-build time:

- parser for ``"Transfer(address indexed from, address indexed to, uint value)"``
  (reference: /root/reference/eth_event_macro/src/events.rs:13-115 — a nom
  parser producing an ``ethabi::Event``). Like the reference we reject a
  leading ``event`` keyword (events.rs:16-18) and trailing garbage
  (events.rs:81-86), and accept the empty-param and trailing ``anonymous``
  forms (events.rs:44,51-59).
- canonical signature + topic0 hash: keccak-256 of ``Name(type1,...)`` with
  canonicalized types (``uint`` -> ``uint256``), the analog of
  ``ethabi::Event::signature()`` used at stream.rs:113,126.
- Spark schema: the macro's struct augmentation (eth_event_macro/src/lib.rs:
  190-220 — fixed columns block_number/transaction_hash/address/log_index plus
  the declaration-ordered data tuple) becomes a plain ``StructType``; named
  fields instead of a positional tuple, which is the idiomatic Spark shape.

Type support is a superset of the reference (which handles address/uint/
uint256/bool and ``todo!()``s the rest — events.rs:103-108,
eth_event_macro/src/lib.rs:108-111).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

from .keccak import keccak256_hex

# uint256 cannot fit DecimalType(38,0) (2^256 ~ 1.16e77); policy per SURVEY
# §7.4.1: DecimalType(38,0) for arithmetic where the value fits (nulled above
# 10^38-1, strictly better than the reference's silent i128 wrap at
# examples/stream_multi.rs:59) plus a lossless hex string column alongside.
UINT_DECIMAL = T.DecimalType(38, 0)

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_UINT_RE = re.compile(r"^uint(\d+)?$")
_INT_RE = re.compile(r"^int(\d+)?$")
_BYTES_RE = re.compile(r"^bytes(\d+)?$")


class EventDeclarationError(ValueError):
    """Raised on malformed event declarations (parser fail-fast, like nom)."""


@dataclass(frozen=True)
class EventParam:
    name: str
    type: str  # canonical ABI type, e.g. "uint256"
    indexed: bool


@dataclass(frozen=True)
class EventSchema:
    name: str
    params: tuple[EventParam, ...]
    anonymous: bool = False
    decl: str = ""

    @property
    def canonical_signature(self) -> str:
        """``Name(type1,type2,...)`` with canonical ABI types."""
        return f"{self.name}({','.join(p.type for p in self.params)})"

    @property
    def topic0(self) -> str:
        """keccak-256 of the canonical signature — the log's topics[0]."""
        return keccak256_hex(self.canonical_signature)

    @property
    def indexed_params(self) -> tuple[EventParam, ...]:
        return tuple(p for p in self.params if p.indexed)

    @property
    def data_params(self) -> tuple[EventParam, ...]:
        return tuple(p for p in self.params if not p.indexed)

    def spark_type(self, abi_type: str) -> T.DataType:
        return abi_to_spark_type(abi_type)

    def to_struct_type(self, include_fixed: bool = True) -> T.StructType:
        """Typed-event schema: fixed columns + declaration-ordered params.

        Mirrors the macro's augmented struct (lib.rs:190-220) with named
        param fields. Numeric params additionally get a lossless
        ``<name>_hex`` column (SURVEY §7.4.1).
        """
        fields: list[T.StructField] = []
        if include_fixed:
            fields += [
                T.StructField("block_number", T.LongType(), False),
                T.StructField("transaction_hash", T.StringType(), True),
                T.StructField("address", T.StringType(), False),
                T.StructField("log_index", T.LongType(), False),
            ]
        for p in self.params:
            hashed = p.indexed and topic_is_hash(p.type)
            if hashed:
                # per the ABI spec an indexed dynamic/array/tuple param's
                # topic is the keccak hash of the value — surfaced as a hex
                # string, and declared as such (matching decode_columns)
                typ: T.DataType = T.StringType()
            else:
                typ = abi_to_spark_type(p.type)
            fields.append(T.StructField(p.name, typ, True))
            if _needs_lossless_hex(p.type) and not hashed:
                # a hashed topic already IS the only recoverable encoding —
                # a `_hex` column would merely duplicate it
                fields.append(T.StructField(f"{p.name}_hex", T.StringType(), True))
        return T.StructType(fields)


def _split_top_level(s: str) -> list[str]:
    """Split on commas at parenthesis depth 0 (tuple-aware)."""
    parts: list[str] = []
    depth, cur = 0, []
    for ch in s:
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        cur.append(ch)
    parts.append("".join(cur))
    return parts


def tuple_components(abi_type: str) -> tuple[str, ...]:
    """Component types of a canonical tuple type ``(T1,T2,...)``."""
    inner = abi_type[1:-1]
    return tuple(_split_top_level(inner)) if inner else ()


_ARRAY_SUFFIX_RE = re.compile(r"^(.*)\[(\d*)\]$")


def split_array(abi_type: str) -> tuple[str, int | None] | None:
    """Strip ONE trailing array suffix: ``uint256[3][]`` -> ("uint256[3]",
    None); ``uint256[3]`` -> ("uint256", 3). None for non-array types."""
    if not abi_type.endswith("]"):
        return None
    m = _ARRAY_SUFFIX_RE.match(abi_type)
    if not m:
        return None
    base, n = m.group(1), m.group(2)
    return (base, int(n) if n else None)


def is_dynamic_type(abi_type: str) -> bool:
    """ABI 'dynamic' predicate: string/bytes, every ``T[]`` array, a fixed
    ``T[k]`` array of dynamic T, and any tuple with a dynamic component.
    Dynamic types occupy ONE head slot (an offset to their tail); static
    types encode inline."""
    if abi_type in ("string", "bytes"):
        return True
    arr = split_array(abi_type)
    if arr is not None:
        base, k = arr
        return True if k is None else is_dynamic_type(base)
    if abi_type.startswith("("):
        return any(is_dynamic_type(c) for c in tuple_components(abi_type))
    return False


def static_head_slots(abi_type: str) -> int:
    """Head slots a type occupies in a head area: 1 for dynamic (the
    offset) and for static scalars; k x element slots for static fixed
    arrays; the component-slot sum for static tuples (both inline)."""
    if is_dynamic_type(abi_type):
        return 1
    arr = split_array(abi_type)
    if arr is not None:
        base, k = arr
        return k * static_head_slots(base)
    if abi_type.startswith("("):
        return sum(static_head_slots(c) for c in tuple_components(abi_type))
    return 1


def topic_is_hash(abi_type: str) -> bool:
    """Per the ABI spec, an INDEXED param of dynamic, array, or tuple type
    puts keccak(encoding) in the topic — the value itself is unrecoverable
    from the log."""
    return (
        abi_type in ("string", "bytes")
        or abi_type.endswith("]")
        or abi_type.startswith("(")
    )


def canonical_abi_type(raw: str) -> str:
    """Canonicalize an ABI type name; raise on unsupported syntax.

    ``uint`` -> ``uint256``, ``int`` -> ``int256``; validates bit widths.
    One-level dynamic arrays (``uint256[]``, ``string[]``, ``bytes[]``, ...)
    and flat tuples of static scalar types (``(uint256,address)`` — the ABI
    form of a Solidity struct param) canonicalize recursively; the keccak
    signature uses this canonical form, so ``uint[] -> uint256[]`` and
    ``(uint, bool) -> (uint256,bool)`` matter for topic0.
    """
    raw = raw.strip()
    if raw.endswith("]"):
        # peel ONE array suffix (dynamic [] or fixed [k]) and recurse
        m = _ARRAY_SUFFIX_RE.match(raw)
        if not m:
            raise EventDeclarationError(f"bad array suffix: {raw!r}")
        base, n = m.group(1).strip(), m.group(2)
        if n == "":
            return f"{canonical_abi_type(base)}[]"
        if int(n) < 1:
            raise EventDeclarationError(f"invalid array size: {raw!r}")
        return f"{canonical_abi_type(base)}[{int(n)}]"
    if raw.startswith("("):
        if not raw.endswith(")"):
            raise EventDeclarationError(f"unbalanced tuple type: {raw!r}")
        inner = raw[1:-1].strip()
        if not inner:
            raise EventDeclarationError(f"empty tuple type: {raw!r}")
        comps = [canonical_abi_type(c) for c in _split_top_level(inner)]
        return f"({','.join(comps)})"
    if raw == "address":
        return "address"
    if raw == "bool":
        return "bool"
    if raw == "string":
        return "string"
    m = _UINT_RE.match(raw)
    if m:
        bits = int(m.group(1) or 256)
        if bits % 8 != 0 or not (8 <= bits <= 256):
            raise EventDeclarationError(f"invalid uint width: {raw}")
        return f"uint{bits}"
    m = _INT_RE.match(raw)
    if m:
        bits = int(m.group(1) or 256)
        if bits % 8 != 0 or not (8 <= bits <= 256):
            raise EventDeclarationError(f"invalid int width: {raw}")
        return f"int{bits}"
    m = _BYTES_RE.match(raw)
    if m:
        if m.group(1) is None:
            return "bytes"
        n = int(m.group(1))
        if not (1 <= n <= 32):
            raise EventDeclarationError(f"invalid bytes width: {raw}")
        return f"bytes{n}"
    raise EventDeclarationError(f"unsupported ABI type: {raw!r}")


def abi_to_spark_type(abi_type: str) -> T.DataType:
    """Canonical ABI type -> Spark type (SURVEY §1.2 mapping).

    Tuples map to StructType with positional field names ``f0..fk`` (the
    ABI carries no component names at the event-signature level); wide
    numeric components rely on the whole-tuple lossless ``<name>_hex``
    column rather than per-component hex fields.
    """
    arr = split_array(abi_type)  # before the tuple check: "(T,U)[...]" is an array
    if arr is not None:
        return T.ArrayType(abi_to_spark_type(arr[0]))
    if abi_type.startswith("("):
        return T.StructType(
            [
                T.StructField(f"f{i}", abi_to_spark_type(c), True)
                for i, c in enumerate(tuple_components(abi_type))
            ]
        )
    if abi_type == "address":
        return T.StringType()  # lowercase 0x-hex; join- and oracle-friendly
    if abi_type == "bool":
        return T.BooleanType()
    if abi_type == "string":
        return T.StringType()
    if abi_type == "bytes":
        return T.BinaryType()
    m = _UINT_RE.match(abi_type)
    if m:
        bits = int(m.group(1) or 256)
        return T.LongType() if bits <= 63 else UINT_DECIMAL
    m = _INT_RE.match(abi_type)
    if m:
        bits = int(m.group(1) or 256)
        return T.LongType() if bits <= 64 else UINT_DECIMAL
    if _BYTES_RE.match(abi_type):
        return T.StringType()  # fixed-size bytes as 0x-hex
    raise EventDeclarationError(f"unsupported ABI type: {abi_type!r}")


def _needs_lossless_hex(abi_type: str) -> bool:
    if is_dynamic_type(abi_type):
        # the head slot is an offset, not the value's encoding — nothing
        # lossless to surface inline (string/bytes/T[]/dynamic composites)
        return False
    arr = split_array(abi_type)
    if arr is not None:
        # STATIC fixed array: inline k x slots, same policy as static tuples
        return _needs_lossless_hex(arr[0])
    if abi_type.startswith("("):
        # a STATIC tuple's hex column carries its FULL k-slot inline encoding
        # — lossless for every component, incl. wide numerics that null
        return any(_needs_lossless_hex(c) for c in tuple_components(abi_type))
    m = _UINT_RE.match(abi_type)
    if m and int(m.group(1) or 256) > 63:
        return True
    m = _INT_RE.match(abi_type)
    if m and int(m.group(1) or 256) > 64:
        return True
    return False


def parse_event_declaration(decl: str) -> EventSchema:
    """Parse ``Name(type [indexed] name, ...) [anonymous]`` -> EventSchema.

    Fail-fast on: leading ``event`` keyword, missing parens, bad types,
    duplicate/invalid param names, trailing garbage.
    """
    s = decl.strip()
    if s.startswith("event ") or s == "event":
        raise EventDeclarationError(
            "do not lead with the 'event' keyword (declaration only)"
        )
    lparen = s.find("(")
    if lparen < 0:
        raise EventDeclarationError(f"missing '(' in declaration: {decl!r}")
    name = s[:lparen].strip()
    if not _NAME_RE.match(name):
        raise EventDeclarationError(f"invalid event name: {name!r}")
    rparen = s.rfind(")")
    if rparen < lparen:
        raise EventDeclarationError(f"missing ')' in declaration: {decl!r}")
    tail = s[rparen + 1 :].strip()
    anonymous = False
    if tail == "anonymous":
        anonymous = True
    elif tail:
        raise EventDeclarationError(f"trailing garbage after ')': {tail!r}")

    body = s[lparen + 1 : rparen].strip()
    params: list[EventParam] = []
    if body:
        seen: set[str] = set()
        for raw in _split_top_level(body):
            raw_s = raw.strip()
            if raw_s.startswith("("):
                # tuple-typed param: the type itself contains commas/spaces —
                # take the balanced-paren prefix (plus any [] suffix) as the
                # type, the remainder as [indexed] name
                depth = 0
                end = -1
                for idx, ch in enumerate(raw_s):
                    if ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                        if depth == 0:
                            end = idx
                            break
                if end < 0:
                    raise EventDeclarationError(f"bad parameter: {raw_s!r}")
                sfx = re.match(r"(\[\d*\])*", raw_s[end + 1 :])
                end += len(sfx.group(0)) if sfx else 0
                toks = [raw_s[: end + 1]] + raw_s[end + 1 :].split()
            else:
                toks = raw_s.split()
            if len(toks) == 2:
                if toks[1] == "indexed":  # "address indexed" — name missing
                    raise EventDeclarationError(f"bad parameter: {raw_s!r}")
                typ, indexed, pname = toks[0], False, toks[1]
            elif len(toks) == 3 and toks[1] == "indexed":
                typ, indexed, pname = toks[0], True, toks[2]
            else:
                raise EventDeclarationError(f"bad parameter: {raw_s!r}")
            if not _NAME_RE.match(pname):
                raise EventDeclarationError(f"invalid parameter name: {pname!r}")
            if pname in seen:
                raise EventDeclarationError(f"duplicate parameter name: {pname!r}")
            seen.add(pname)
            params.append(EventParam(pname, canonical_abi_type(typ), indexed))

    return EventSchema(name=name, params=tuple(params), anonymous=anonymous, decl=decl)


def event_schema(decl: str, include_fixed: bool = True) -> T.StructType:
    """Declaration string -> Spark StructType (the ``event_schema`` of SURVEY §1.3)."""
    return parse_event_declaration(decl).to_struct_type(include_fixed=include_fixed)
