"""Deterministic ``eth_logs`` fixture — stand-in for ``eth_getLogs``.

Reproduces the invariants the reference's live integration test relies on
(/root/reference/eth_event_stream/src/stream.rs:304-375: USDC Transfers over a
fixed 9-block range with a golden count of 56 logs) without a network: a
seeded synthetic log table matching FIXTURES.md §1, including

- two contract addresses sharing the Transfer topic0 (two synchronized
  sources, as in examples/stream_multi.rs:92-97);
- empty blocks per-address and globally (dense-flush semantics, sink.rs:237-241);
- log_index strictly increasing within a block, interleaved across addresses
  (the sorted merge at sink.rs:117-119 must interleave);
- duplicate (address, block, log_index) rows (idempotent upsert, sink.rs:280-296);
- removed=true rows (reorg policy, stream.rs:174-181);
- values >= 2^64 and one near 10^38 (decimal edge, SURVEY §7.4.1);
- a declared golden count of non-removed logs for address A.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from ..functions.keccak import keccak256_hex

TRANSFER_DECL = "Transfer(address indexed from, address indexed to, uint value)"
TRANSFER_TOPIC0 = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"

ADDR_A = "0xa0b86991c6218b36c1d19d4a2e9eb0ce3606eb48"  # USDC (public constant)
ADDR_B = "0xdac17f958d2ee523a2206206994597c13d831ec7"  # USDT (public constant)


def _hex32(value: int) -> str:
    return "0x" + format(value, "x").rjust(64, "0")


def _addr_topic(addr: str) -> str:
    return "0x" + addr[2:].rjust(64, "0")


@dataclass
class EthLogsFixture:
    rows: list[dict] = field(default_factory=list)
    from_block: int = 0
    to_block: int = 0
    golden_count_a: int = 0  # non-removed, non-duplicate logs of ADDR_A
    total_events: int = 0  # distinct non-removed (address, block, log_index)

    def to_arrow(self):
        import pyarrow as pa

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
        cols = {name: [r[name] for r in self.rows] for name in schema.names}
        return pa.table(cols, schema=schema)

    def write_parquet(self, path: str) -> str:
        import pyarrow.parquet as pq

        pq.write_table(self.to_arrow(), path)
        return path


def generate_eth_logs(
    from_block: int = 14_658_323,
    to_block: int = 14_658_421,
    seed: int = 42,
    events_per_block_mean: float = 4.0,
) -> EthLogsFixture:
    """Seeded synthetic Transfer logs for ADDR_A and ADDR_B."""
    rng = random.Random(seed)
    fx = EthLogsFixture(from_block=from_block, to_block=to_block)
    wallets = [f"0x{rng.getrandbits(160):040x}" for _ in range(40)]

    special_values = [
        2**64,  # beyond long
        10**38 - 1,  # decimal(38,0) max
        10**38 + 12345,  # just past decimal range -> NULL decimal, hex kept
        2**127 + 7,  # beyond the reference's i128 wrap point
    ]
    specials = iter(special_values)

    for block in range(from_block, to_block + 1):
        r = rng.random()
        if r < 0.10:
            continue  # globally empty block
        n_a = 0 if r < 0.25 else rng.randint(1, int(events_per_block_mean))
        n_b = 0 if (0.10 <= r < 0.18 or r > 0.9) else rng.randint(1, 3)
        # interleave sources in emission order; log_index strictly increasing
        emits = [ADDR_A] * n_a + [ADDR_B] * n_b
        rng.shuffle(emits)
        log_index = rng.randint(0, 2)  # other contracts' logs occupy gaps
        for addr in emits:
            src, dst = rng.sample(wallets, 2)
            value = rng.randint(1, 10**12) * 10**6
            if rng.random() < 0.02:
                value = next(specials, value)
            removed = rng.random() < 0.015
            row = {
                "address": addr,
                "topics": [TRANSFER_TOPIC0, _addr_topic(src), _addr_topic(dst)],
                "data": bytes.fromhex(_hex32(value)[2:]),
                "block_number": block,
                "log_index": log_index,
                "transaction_hash": keccak256_hex(f"tx-{block}-{log_index}".encode()),
                "removed": removed,
            }
            fx.rows.append(row)
            if not removed:
                fx.total_events += 1
                if addr == ADDR_A:
                    fx.golden_count_a += 1
            # idempotent-upsert duplicates: same key re-fetched
            if rng.random() < 0.03:
                fx.rows.append(dict(row))
            log_index += rng.randint(1, 4)

    return fx
