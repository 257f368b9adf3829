"""Randomized ABI encode->decode round-trip: a seeded fuzz over the full
supported type lattice (addresses, uintN, intN, bool, bytesN, string, bytes,
indexed and not), encoded by an independent pure-Python ABI encoder and
decoded by the engine's column expressions in ONE DataFrame pass.

This is the property-based upgrade of the reference's golden-count test
(stream.rs:304-375): instead of one fixed range with one known count, every
supported type is exercised across its value domain, including boundaries
(0, max, sign flips, decimal-range edges).
"""

from __future__ import annotations

import random
from decimal import Decimal

import pyarrow as pa
import pytest

from eth_event_stream_spark.functions.decode import decode_event
from eth_event_stream_spark.functions.schema import parse_event_declaration

SEED = 20260813


def _tuple_comps(typ: str) -> list[str]:
    """Top-level comma split of a tuple type (nested tuples carry commas)."""
    parts, depth, cur = [], 0, []
    for ch in typ[1:-1]:
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        depth += ch == "("
        depth -= ch == ")"
        cur.append(ch)
    parts.append("".join(cur))
    return parts


import re as _re

_ARR_RE = _re.compile(r"^(.*)\[(\d*)\]$")


def _split_arr(typ: str):
    """("uint256[3]") -> ("uint256", 3); ("T[]") -> ("T", None); else None."""
    if not typ.endswith("]"):
        return None
    m = _ARR_RE.match(typ)
    return (m.group(1), int(m.group(2)) if m.group(2) else None)


def _is_dyn(typ: str) -> bool:
    if typ in ("string", "bytes"):
        return True
    arr = _split_arr(typ)
    if arr is not None:
        return True if arr[1] is None else _is_dyn(arr[0])
    if typ.startswith("("):
        return any(_is_dyn(c) for c in _tuple_comps(typ))
    return False


def _head_slots(typ: str) -> int:
    if _is_dyn(typ):
        return 1
    arr = _split_arr(typ)
    if arr is not None:
        return arr[1] * _head_slots(arr[0])
    if typ.startswith("("):
        return sum(_head_slots(c) for c in _tuple_comps(typ))
    return 1


def _enc_static(typ: str, v) -> bytes:
    arr = _split_arr(typ)
    if arr is not None:  # static fixed array: elements inline
        return b"".join(_enc_static(arr[0], e) for e in v)
    if typ.startswith("("):  # static tuple: components inline
        return b"".join(_enc_static(ct, cv) for ct, cv in zip(_tuple_comps(typ), v))
    if typ == "address":
        return bytes(12) + bytes.fromhex(v[2:])
    if typ == "bool":
        return (1 if v else 0).to_bytes(32, "big")
    if typ.startswith("uint"):
        return v.to_bytes(32, "big")
    if typ.startswith("int"):
        return (v % 2**256).to_bytes(32, "big")
    if typ.startswith("bytes"):  # bytesN
        n = int(typ[5:])
        return v + bytes(32 - n)
    raise AssertionError(typ)


def _enc_dynamic(payload: bytes) -> bytes:
    n = len(payload)
    return n.to_bytes(32, "big") + payload + bytes((32 - n % 32) % 32)


def _enc_value(typ: str, v) -> bytes:
    """Full encoding of one value: a static value's inline slots, or a
    dynamic value's tail (what its offset points at)."""
    if typ == "string":
        return _enc_dynamic(v.encode())
    if typ == "bytes":
        return _enc_dynamic(v)
    arr = _split_arr(typ)
    if arr is not None and arr[1] is None:
        # dynamic T[]: [count][tuple-encoding of the k elements]
        return len(v).to_bytes(32, "big") + _enc_members([(arr[0], e) for e in v])
    if arr is not None and _is_dyn(typ):
        # fixed T[k] of dynamic T: tuple encoding, NO count slot (ABI spec:
        # enc(X[k]) = enc((X[0],...,X[k-1])))
        return _enc_members([(arr[0], e) for e in v])
    if typ.startswith("(") and _is_dyn(typ):
        return _enc_members(list(zip(_tuple_comps(typ), v)))
    return _enc_static(typ, v)


def _enc_members(members: list[tuple[str, object]]) -> bytes:
    """ABI tuple encoding: head area (static inline, dynamic as offsets
    relative to the area start) + concatenated dynamic tails."""
    head_size = 32 * sum(_head_slots(t) for t, _ in members)
    heads, tails = [], []
    for typ, v in members:
        if _is_dyn(typ):
            offset = head_size + sum(len(t) for t in tails)
            heads.append(offset.to_bytes(32, "big"))
            tails.append(_enc_value(typ, v))
        else:
            heads.append(_enc_value(typ, v))
    return b"".join(heads) + b"".join(tails)


def _encode_data(params: list[tuple[str, object]]) -> bytes:
    """Standard ABI head/tail encoding of non-indexed params (the data
    section is the tuple of those params)."""
    return _enc_members(params)


def _rand_value(rng: random.Random, typ: str):
    arr = _split_arr(typ)  # before the tuple check: "(T,U)[...]" is an array
    if arr is not None:
        n = rng.randint(0, 5) if arr[1] is None else arr[1]
        return [_rand_value(rng, arr[0]) for _ in range(n)]
    if typ.startswith("("):
        return tuple(_rand_value(rng, ct) for ct in _tuple_comps(typ))
    if typ == "address":
        return f"0x{rng.getrandbits(160):040x}"
    if typ == "bool":
        return rng.random() < 0.5
    if typ.startswith("uint"):
        bits = int(typ[4:] or 256)
        choices = [0, 1, 2**bits - 1, rng.getrandbits(bits)]
        if bits >= 130:
            choices += [10**38 - 1, 10**38]  # decimal-range edge
        return rng.choice([c for c in choices if c < 2**bits])
    if typ.startswith("int"):
        bits = int(typ[3:] or 256)
        lo, hi = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
        return rng.choice([0, -1, lo, hi, rng.randint(lo, hi)])
    if typ.startswith("bytes") and typ != "bytes":
        n = int(typ[5:])
        return rng.getrandbits(8 * n).to_bytes(n, "big")
    if typ == "string":
        return "".join(rng.choice("abcdef ∆é") for _ in range(rng.randint(0, 70)))
    if typ == "bytes":
        # one length draw — two independent draws overflowed to_bytes
        n = rng.randint(0, 70)
        return rng.getrandbits(8 * n).to_bytes(n, "big") if rng.random() < 0.9 else b""
    raise AssertionError(typ)


def _expected(typ: str, v):
    """What the decoder should surface for a value of this type."""
    arr = _split_arr(typ)  # before the tuple check: "(T,U)[...]" is an array
    if arr is not None:
        return [_expected(arr[0], e) for e in v]
    if typ.startswith("("):
        return tuple(_expected(ct, cv) for ct, cv in zip(_tuple_comps(typ), v))
    if typ == "address":
        return v.lower()
    if typ == "bool":
        return v
    if typ.startswith("uint"):
        bits = int(typ[4:] or 256)
        if bits <= 63:
            return v
        return Decimal(v) if v < 10**38 else None
    if typ.startswith("int"):
        bits = int(typ[3:] or 256)
        if bits <= 63:
            return v
        if bits <= 122:
            return Decimal(v)
        return Decimal(v) if abs(v) <= 10**38 - 1 else None
    if typ.startswith("bytes") and typ != "bytes":
        return "0x" + v.hex()
    if typ == "string":
        return v
    if typ == "bytes":
        return v
    raise AssertionError(typ)


TYPES = [
    "address",
    "bool",
    "uint8",
    "uint32",
    "uint64",
    "uint128",
    "uint256",
    "int8",
    "int64",
    "int120",
    "int256",
    "bytes4",
    "bytes32",
    "string",
    "bytes",
    "uint256[]",
    "address[]",
    "uint64[]",
    "bool[]",
    "string[]",
    "bytes[]",
    "(uint256,address)",
    "(uint64,bool,bytes4)",
    "(int128,uint8,address)",
    # round-4 extensions: dynamic-component tuples, nested arrays, arrays of
    # tuples, nested tuples — the types the reference todo!()s entirely
    "(uint64,string)",
    "(string,address,bytes)",
    "(uint256,uint64[])",
    "(address,(uint64,bool))",
    "uint64[][]",
    "address[][]",
    "string[][]",
    "(uint64,bool)[]",
    "(uint256,address)[]",
    "(uint64,string)[]",
    # fixed-size arrays: static (inline slots) and dynamic-element (tuple
    # encoding without a count slot) forms
    "uint256[3]",
    "address[2]",
    "bytes4[3]",
    "string[2]",
    "(uint64,bool)[2]",
    "uint64[2][]",
    "uint32[2][3]",
]
# indexed dynamic params and tuples are keccak hashes per the ABI spec —
# exclude them
INDEXABLE = [
    t
    for t in TYPES
    if t not in ("string", "bytes") and not t.endswith("]") and not t.startswith("(")
]


def test_tuple_and_dynamic_array_roundtrip(spark):
    """Deterministic pin of the round-2 type extensions: string[]/bytes[]
    (two-level head/tail) and flat static tuples (inline k-slot encoding,
    incl. a wide numeric component -> whole-tuple lossless hex), mixed with
    scalars so head-slot accounting across multi-slot tuples is exercised."""
    decl = (
        "Evt((uint256,address) pair, string[] names, uint64 n, "
        "bytes[] blobs, (uint32,bool,bytes4) trip)"
    )
    vals = {
        "pair": (10**38 + 7, "0x" + "ab" * 20),  # uint256 beyond decimal range
        "names": ["alice", "", "b∆b"],
        "n": 7,
        "blobs": [b"\x01\x02", b"", b"\xff" * 40],
        "trip": (2**31, True, b"\xde\xad\xbe\xef"),
    }
    types = {
        "pair": "(uint256,address)",
        "names": "string[]",
        "n": "uint64",
        "blobs": "bytes[]",
        "trip": "(uint32,bool,bytes4)",
    }
    ev = parse_event_declaration(decl)
    data = _encode_data([(types[n], vals[n]) for n in vals])
    row = {
        "address": "0x" + "aa" * 20,
        "topics": [ev.topic0],
        "data": data,
        "block_number": 1,
        "log_index": 0,
        "transaction_hash": "0x0",
        "removed": False,
    }
    schema = pa.schema(
        [
            pa.field("address", pa.string()),
            pa.field("topics", pa.list_(pa.string())),
            pa.field("data", pa.binary()),
            pa.field("block_number", pa.int64()),
            pa.field("log_index", pa.int64()),
            pa.field("transaction_hash", pa.string()),
            pa.field("removed", pa.bool_()),
        ]
    )
    tbl = pa.table({k: [row[k]] for k in schema.names}, schema=schema)
    df = spark.createDataFrame(tbl.to_pandas())
    r = decode_event(df, decl).collect()[0]

    for name in vals:
        assert _norm(r[name]) == _expected(types[name], vals[name]), name
    # the out-of-decimal-range uint256 component nulls, but the tuple's
    # lossless hex carries the full 2-slot inline encoding
    assert r["pair"]["f0"] is None
    assert r["pair_hex"] == "0x" + _enc_static(types["pair"], vals["pair"]).hex()
    # and the trip tuple (no wide numerics) gets no hex column
    assert "trip_hex" not in r.asDict()


def test_nested_and_dynamic_composite_roundtrip(spark):
    """Deterministic pin of the round-4 type extensions: tuples with dynamic
    components, nested arrays (T[][]), arrays of tuples (static and dynamic
    components), nested tuples — plus the indexed-composite hex policy: a
    hashed topic is surfaced once as <name>, never duplicated as <name>_hex."""
    import pyspark.sql.types as T

    from eth_event_stream_spark.functions.schema import event_schema

    decl = (
        "Evt((uint256,string) a, uint64[][] m, (uint256,address)[] pairs, "
        "(address,(uint64,bool)) nest, (uint256,address) indexed key, "
        "(uint64,string)[] tagged, string s)"
    )
    addr1, addr2, addr3 = ("0x" + c * 40 for c in "abc")
    vals = {
        "a": (10**38 + 5, "héllo"),  # wide comp beyond decimal range
        "m": [[1, 2, 3], [], [5]],
        "pairs": [(10**38 + 5, addr1), (3, addr2)],
        "nest": (addr3, (9, True)),
        "tagged": [(7, "x"), (8, ""), (9, "yz∆")],
        "s": "tail",
    }
    types = {
        "a": "(uint256,string)",
        "m": "uint64[][]",
        "pairs": "(uint256,address)[]",
        "nest": "(address,(uint64,bool))",
        "tagged": "(uint64,string)[]",
        "s": "string",
    }
    ev = parse_event_declaration(decl)
    key_hash = "0x" + "7e" * 32  # an indexed tuple's topic IS a keccak hash
    data = _encode_data([(types[n], vals[n]) for n in vals])
    row = {
        "address": "0x" + "aa" * 20,
        "topics": [ev.topic0, key_hash],
        "data": data,
        "block_number": 1,
        "log_index": 0,
        "transaction_hash": "0x0",
        "removed": False,
    }
    schema = pa.schema(
        [
            pa.field("address", pa.string()),
            pa.field("topics", pa.list_(pa.string())),
            pa.field("data", pa.binary()),
            pa.field("block_number", pa.int64()),
            pa.field("log_index", pa.int64()),
            pa.field("transaction_hash", pa.string()),
            pa.field("removed", pa.bool_()),
        ]
    )
    tbl = pa.table({k: [row[k]] for k in schema.names}, schema=schema)
    df = spark.createDataFrame(tbl.to_pandas())
    r = decode_event(df, decl).collect()[0]

    for name in vals:
        assert _norm(r[name]) == _expected(types[name], vals[name]), name
    # the out-of-range uint256 components null individually; neighbors intact
    assert r["a"]["f0"] is None and r["a"]["f1"] == "héllo"
    assert r["pairs"][0]["f0"] is None and r["pairs"][1]["f0"] == 3
    # indexed composite: the hash itself, surfaced ONCE (no _hex duplicate)
    assert r["key"] == key_hash
    d = r.asDict()
    assert "key_hex" not in d
    # dynamic tuples carry no _hex either (their head slot is an offset)
    assert "a_hex" not in d and "pairs_hex" not in d
    # and the declared schema agrees with what was decoded
    st = event_schema(decl)
    assert st["key"].dataType == T.StringType()
    assert "key_hex" not in st.names and "a_hex" not in st.names
    # uint64 > 63 bits -> DecimalType(38,0) per the width policy
    assert st["m"].dataType == T.ArrayType(T.ArrayType(T.DecimalType(38, 0)))
    assert st["pairs"].dataType == T.ArrayType(
        T.StructType(
            [
                T.StructField("f0", T.DecimalType(38, 0), True),
                T.StructField("f1", T.StringType(), True),
            ]
        )
    )


def test_fixed_size_array_roundtrip(spark):
    """Deterministic pin for fixed-size arrays: static T[k] (inline k x slot
    encoding, with the whole-array lossless hex when elements are wide
    numerics), dynamic-element T[k] (tuple encoding, no count slot), and a
    nested fixed-of-fixed shape."""
    decl = (
        "Evt(uint256[2] amounts, string[2] labels, uint32[2][3] grid, "
        "address[2] indexed whitelist, uint64 tailn)"
    )
    vals = {
        "amounts": [10**38 + 9, 5],  # first element beyond decimal range
        "labels": ["a∆", ""],
        "grid": [[1, 2], [3, 4], [5, 6]],
        "tailn": 11,
    }
    types = {
        "amounts": "uint256[2]",
        "labels": "string[2]",
        "grid": "uint32[2][3]",
        "tailn": "uint64",
    }
    ev = parse_event_declaration(decl)
    whitelist_hash = "0x" + "5a" * 32  # indexed array topic IS a hash
    data = _encode_data([(types[n], vals[n]) for n in vals])
    row = {
        "address": "0x" + "aa" * 20,
        "topics": [ev.topic0, whitelist_hash],
        "data": data,
        "block_number": 1,
        "log_index": 0,
        "transaction_hash": "0x0",
        "removed": False,
    }
    schema = pa.schema(
        [
            pa.field("address", pa.string()),
            pa.field("topics", pa.list_(pa.string())),
            pa.field("data", pa.binary()),
            pa.field("block_number", pa.int64()),
            pa.field("log_index", pa.int64()),
            pa.field("transaction_hash", pa.string()),
            pa.field("removed", pa.bool_()),
        ]
    )
    tbl = pa.table({k: [row[k]] for k in schema.names}, schema=schema)
    df = spark.createDataFrame(tbl.to_pandas())
    r = decode_event(df, decl).collect()[0]

    for name in vals:
        assert _norm(r[name]) == _expected(types[name], vals[name]), name
    # static fixed array of wide numerics: out-of-range element nulls, and
    # the lossless hex carries the FULL inline 2-slot encoding
    assert r["amounts"][0] is None and r["amounts"][1] == 5
    assert r["amounts_hex"] == "0x" + _enc_static("uint256[2]", vals["amounts"]).hex()
    # indexed fixed array: the hash once, no _hex duplicate
    assert r["whitelist"] == whitelist_hash
    assert "whitelist_hex" not in r.asDict()


def _norm(x):
    """Canonicalize collected cells: bytearray -> bytes, Row -> tuple,
    recursively (bytes[] yields lists of bytearray; tuples yield Rows)."""
    if isinstance(x, bytearray):
        return bytes(x)
    if isinstance(x, list):
        return [_norm(e) for e in x]
    if isinstance(x, tuple):  # includes Row
        return tuple(_norm(e) for e in x)
    return x


@pytest.mark.parametrize("case_seed", [SEED, SEED + 1, SEED + 2, SEED + 3, SEED + 4])
def test_random_roundtrip(spark, case_seed):
    rng = random.Random(case_seed)
    # one random event shape per seed, many random rows decoded in one pass
    n_params = rng.randint(1, 6)
    params = []
    for i in range(n_params):
        typ = rng.choice(TYPES)
        indexed = typ in INDEXABLE and rng.random() < 0.4 and sum(p[2] for p in params) < 3
        params.append((f"p{i}", typ, indexed))
    decl = "Evt(" + ", ".join(
        f"{t} indexed {n}" if ix else f"{t} {n}" for n, t, ix in params
    ) + ")"
    ev = parse_event_declaration(decl)

    rows, expected = [], []
    for li in range(120):
        vals = {n: _rand_value(rng, t) for n, t, _ in params}
        topics = [ev.topic0] + [
            "0x" + _enc_static(t, vals[n]).hex() for n, t, ix in params if ix
        ]
        data = _encode_data([(t, vals[n]) for n, t, ix in params if not ix])
        rows.append(
            {
                "address": "0x" + "aa" * 20,
                "topics": topics,
                "data": data,
                "block_number": 1,
                "log_index": li,
                "transaction_hash": f"0x{li:x}",
                "removed": False,
            }
        )
        expected.append({n: _expected(t, vals[n]) for n, t, _ in params})

    schema = pa.schema(
        [
            pa.field("address", pa.string()),
            pa.field("topics", pa.list_(pa.string())),
            pa.field("data", pa.binary()),
            pa.field("block_number", pa.int64()),
            pa.field("log_index", pa.int64()),
            pa.field("transaction_hash", pa.string()),
            pa.field("removed", pa.bool_()),
        ]
    )
    tbl = pa.table({k: [r[k] for r in rows] for k in schema.names}, schema=schema)
    df = spark.createDataFrame(tbl.to_pandas())

    got = {r["log_index"]: r for r in decode_event(df, decl).collect()}
    assert len(got) == 120, decl
    for li, exp in enumerate(expected):
        r = got[li]
        for name, want in exp.items():
            assert _norm(r[name]) == want, (decl, li, name, _norm(r[name]), want)
