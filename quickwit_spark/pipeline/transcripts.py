"""Deterministic synthetic transcripts table + tenants dimension.

Input shape per BASELINE.json input_hint:
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp)``.

- Zipf-skewed conversation lengths: a few "hot" conversations hold ~20% of
  turns (exercises conv_id salting).
- ``text`` is a templated log-like line with extractable fields
  (``level=... tenant=... latency_ms=... msg="..."``); ~5% of rows are
  malformed (missing level / bad tenant) to exercise quarantine counters.
- ``ts`` is monotone per conversation with jitter, spanning ~120 days so a
  30d date-histogram yields ≥4 buckets.

Everything is seeded numpy — same (n_turns, seed) ⇒ byte-identical table.
Written with pyarrow directly (no Spark needed to generate).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_WEIGHTS = np.array([0.35, 0.40, 0.05, 0.20])
TOOLS = np.array(["search", "bash", "browser", "sql"])
LEVELS = np.array(["INFO", "INFO", "INFO", "WARN", "ERROR", "DEBUG"])
# message templates as (prefix, slot_kind, suffix): slot 0=none, 1=port, 2=port%255
_MSG_PRE = np.array(
    [
        "server started at ",
        "request completed",
        "cache miss for key k",
        "retrying connection to 10.0.0.",
        "query planned in ",
        "connection refused",
        "disk almost full",
        "flushed ",
    ]
)
_MSG_SLOT = np.array([1, 0, 1, 2, 1, 0, 0, 1])
_MSG_SUF = np.array(["", "", "", "", " us", "", "", " rows to sink"])

_BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")
_SPAN_DAYS = 120


def gen_transcripts(n_turns: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)

    # conversation sizes: zipf-ish skew, capped
    n_convs = max(1, n_turns // 40)
    sizes = rng.zipf(1.6, size=n_convs).astype(np.int64)
    sizes = np.minimum(sizes * 4, 4000)
    total = sizes.cumsum()
    cut = int(np.searchsorted(total, n_turns)) + 1
    sizes = sizes[:cut]
    deficit = n_turns - int(sizes.sum())
    if deficit > 0:
        sizes = np.concatenate([sizes, [deficit]])
    elif deficit < 0:
        sizes[-1] += deficit
        sizes = sizes[sizes > 0]
    n_convs = len(sizes)

    conv_ids_unique = np.array([f"conv-{k:08d}" for k in range(n_convs)])
    conv_id = np.repeat(conv_ids_unique, sizes)
    turn_idx = np.concatenate([np.arange(s, dtype=np.int32) for s in sizes])
    n = len(conv_id)

    role = rng.choice(ROLES, size=n, p=ROLE_WEIGHTS)
    tool = np.where(
        role == "tool", rng.choice(TOOLS, size=n), np.full(n, None, dtype=object)
    ).astype(object)

    # timestamps: per-conv random start within ~100 days, +jittered step per turn
    conv_start = rng.integers(0, (_SPAN_DAYS - 20) * 86_400, size=n_convs)
    start = np.repeat(conv_start, sizes)
    step = rng.integers(1, 180, size=n)
    # per-conversation cumsum, vectorized: global cumsum minus the offset at
    # each conversation start
    cs = np.cumsum(step)
    starts_idx = np.cumsum(np.concatenate([[0], sizes[:-1]]))
    base = np.repeat(cs[starts_idx] - step[starts_idx], sizes)
    within = cs - base
    ts = _BASE_TS + ((start + within) * 1_000_000).astype("timedelta64[us]")

    # text: templated log line with extractable fields
    tenant_num = rng.zipf(1.3, size=n) % 1000  # skewed tenant popularity
    level = rng.choice(LEVELS, size=n)
    latency = rng.integers(1, 5000, size=n)
    port = rng.integers(1024, 9999, size=n)
    msg_idx = rng.integers(0, len(_MSG_PRE), size=n)
    malformed = rng.random(n) < 0.05

    # fully vectorized text assembly (a Python loop here costs minutes at 10M+)
    A = np.char.add
    slot_kind = _MSG_SLOT[msg_idx]
    slot_val = np.where(slot_kind == 2, port % 255, port).astype("U4")
    slot_str = np.where(slot_kind == 0, "", slot_val)
    msg = A(A(_MSG_PRE[msg_idx], slot_str), _MSG_SUF[msg_idx])
    tenant_str = np.char.zfill(tenant_num.astype("U3"), 3)
    good = A(
        A(
            A(A(A("level=", level), " tenant=acme-"), tenant_str),
            A(" latency_ms=", latency.astype("U4")),
        ),
        A(A(' msg="', msg), '"'),
    )
    bad = A(A('latency_ms=NaN msg="', msg), '"')
    texts = np.where(malformed, bad, good).astype(object)

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def gen_tenants(n_tenants: int = 1000, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    tiers = rng.choice(np.array(["free", "pro", "enterprise"]), size=n_tenants, p=[0.6, 0.3, 0.1])
    regions = rng.choice(np.array(["us-east", "us-west", "eu-central", "ap-south"]), size=n_tenants)
    return pa.table(
        {
            "tenant_id": pa.array([f"acme-{i:03d}" for i in range(n_tenants)]),
            "tenant_name": pa.array([f"Acme {i}" for i in range(n_tenants)]),
            "tier": pa.array(tiers),
            "region": pa.array(regions),
        }
    )


def materialize(n_turns: int, out_dir: str, seed: int = 42, num_files: int = 32) -> str:
    """Write transcripts + tenants parquet under ``out_dir`` (idempotent).

    ``transcripts.parquet`` is a DIRECTORY of ``num_files`` part files —
    scan parallelism must not be throttled by maxPartitionBytes on one big
    file (a single 400 MB file caps a 32-core scan at ~4 splits)."""
    os.makedirs(out_dir, exist_ok=True)
    tpath = os.path.join(out_dir, "transcripts.parquet")
    if not os.path.exists(tpath):
        table = gen_transcripts(n_turns, seed)
        tmp = tpath + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        n = table.num_rows
        num_files = max(1, min(num_files, n // 1000 or 1))
        step = (n + num_files - 1) // num_files
        for i in range(num_files):
            chunk = table.slice(i * step, step)
            if chunk.num_rows:
                pq.write_table(
                    chunk,
                    os.path.join(tmp, f"part-{i:05d}.parquet"),
                    row_group_size=max(10_000, step // 4),
                )
        os.rename(tmp, tpath)
    dpath = os.path.join(out_dir, "tenants.parquet")
    if not os.path.exists(dpath):
        pq.write_table(gen_tenants(seed=7), dpath)
    return out_dir
