"""Hypothesis property tests for the event-declaration parser (C1/C2).

The golden suite (tests/test_schema.py, ported from events.rs:117-194)
pins known declarations; these generate the GRAMMAR — arbitrary valid
declarations over the supported type lattice — and assert the invariants
that must hold for every member:

- parse is total on valid declarations and preserves name/params/order/
  indexed flags exactly;
- the canonical signature uses canonical types (uint -> uint256, spacing
  stripped), so two spellings of the same declaration share topic0;
- re-parsing the canonically-rendered declaration is a fixpoint
  (parse(render(parse(d))) == parse(d));
- whitespace injection anywhere the grammar allows it never changes the
  result;
- the declared anonymous suffix round-trips.

Pure Python — no Spark session, so the whole module runs in seconds and
shrinks failures to minimal declarations.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from eth_event_stream_spark.functions.schema import (
    parse_event_declaration,
)

# the supported scalar lattice, in (spelling, canonical) pairs — includes
# the alias forms whose canonicalization changes topic0
_SCALARS = [
    ("address", "address"),
    ("bool", "bool"),
    ("uint", "uint256"),
    ("uint256", "uint256"),
    ("uint8", "uint8"),
    ("uint128", "uint128"),
    ("int", "int256"),
    ("int256", "int256"),
    ("int32", "int32"),
    ("string", "string"),
    ("bytes", "bytes"),
    ("bytes32", "bytes32"),
    ("bytes4", "bytes4"),
]

scalar = st.sampled_from(_SCALARS)


@st.composite
def abi_type(draw):
    """(spelling, canonical) for scalars, one-level arrays, fixed arrays,
    and flat tuples of scalars."""
    kind = draw(st.sampled_from(["scalar", "dyn_array", "fixed_array", "tuple"]))
    if kind == "scalar":
        return draw(scalar)
    if kind == "dyn_array":
        s, c = draw(scalar)
        return f"{s}[]", f"{c}[]"
    if kind == "fixed_array":
        s, c = draw(scalar)
        n = draw(st.integers(min_value=1, max_value=8))
        return f"{s}[{n}]", f"{c}[{n}]"
    comps = draw(st.lists(scalar, min_size=1, max_size=3))
    return (
        "(" + ", ".join(s for s, _ in comps) + ")",
        "(" + ",".join(c for _, c in comps) + ")",
    )


name_st = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s != "event"
)


@st.composite
def declaration(draw):
    """A valid declaration plus its expected parse."""
    ev_name = draw(name_st)
    n_params = draw(st.integers(min_value=0, max_value=5))
    pnames = draw(
        st.lists(name_st, min_size=n_params, max_size=n_params, unique=True)
    )
    params = []
    for pname in pnames:
        spelling, canonical = draw(abi_type())
        indexed = draw(st.booleans())
        params.append((spelling, canonical, indexed, pname))
    anonymous = draw(st.booleans())
    sep = draw(st.sampled_from([", ", ",", " , "]))
    body = sep.join(
        f"{sp}{' indexed' if ix else ''} {pn}" for sp, _, ix, pn in params
    )
    pad = draw(st.sampled_from(["", " ", "  "]))
    decl = f"{pad}{ev_name}({body}){' anonymous' if anonymous else ''}{pad}"
    return decl, ev_name, params, anonymous


@given(declaration())
@settings(max_examples=200, deadline=None)
def test_parse_preserves_structure(case):
    decl, ev_name, params, anonymous = case
    sch = parse_event_declaration(decl)
    assert sch.name == ev_name
    assert sch.anonymous == anonymous
    assert [(p.type, p.indexed, p.name) for p in sch.params] == [
        (canonical, ix, pn) for _, canonical, ix, pn in params
    ]
    # canonical signature is built from canonical types only
    assert sch.canonical_signature == (
        f"{ev_name}({','.join(c for _, c, _, _ in params)})"
    )


@given(declaration())
@settings(max_examples=100, deadline=None)
def test_alias_spellings_share_topic0(case):
    """uint vs uint256 (etc.) spellings of the SAME event hash to the same
    topic0 — the property that makes signature matching spelling-proof."""
    decl, ev_name, params, anonymous = case
    sch = parse_event_declaration(decl)
    canon_decl = (
        f"{ev_name}("
        + ", ".join(
            f"{c}{' indexed' if ix else ''} {pn}" for _, c, ix, pn in params
        )
        + (") anonymous" if anonymous else ")")
    )
    sch2 = parse_event_declaration(canon_decl)
    assert sch2.topic0 == sch.topic0
    assert sch2.canonical_signature == sch.canonical_signature
    # and parse of the canonical rendering is a fixpoint
    assert [(p.type, p.indexed, p.name) for p in sch2.params] == [
        (p.type, p.indexed, p.name) for p in sch.params
    ]


@given(declaration(), st.text(alphabet=" \t", max_size=3))
@settings(max_examples=100, deadline=None)
def test_whitespace_injection_is_neutral(case, ws):
    """Extra whitespace around commas/parens never changes the parse."""
    decl, *_ = case
    spaced = decl.replace(",", f",{ws}").replace("(", f"({ws}")
    a = parse_event_declaration(decl)
    b = parse_event_declaration(spaced)
    assert a.canonical_signature == b.canonical_signature
    assert a.params == b.params and a.anonymous == b.anonymous
