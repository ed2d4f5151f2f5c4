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
MSGS = np.array(
    [
        "server started at {port}",
        "request completed",
        "cache miss for key k{port}",
        "retrying connection to 10.0.0.{oct}",
        "query planned in {port} us",
        "connection refused",
        "disk almost full",
        "flushed {port} rows to sink",
    ]
)

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
    msg_t = rng.choice(MSGS, size=n)
    malformed = rng.random(n) < 0.05

    texts = np.empty(n, dtype=object)
    for i in range(n):
        msg = msg_t[i].replace("{port}", str(port[i])).replace("{oct}", str(port[i] % 255))
        if malformed[i]:
            # missing level and tenant; bad latency token
            texts[i] = f'latency_ms=NaN msg="{msg}"'
        else:
            texts[i] = (
                f"level={level[i]} tenant=acme-{tenant_num[i]:03d} "
                f'latency_ms={latency[i]} msg="{msg}"'
            )

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


def materialize(n_turns: int, out_dir: str, seed: int = 42, num_files: int = 8) -> str:
    """Write transcripts + tenants parquet under ``out_dir`` (idempotent).

    Multiple row groups / files so Spark gets parallel scan partitions."""
    os.makedirs(out_dir, exist_ok=True)
    tpath = os.path.join(out_dir, "transcripts.parquet")
    if not os.path.exists(tpath):
        table = gen_transcripts(n_turns, seed)
        pq.write_table(table, tpath, row_group_size=max(10_000, n_turns // max(num_files, 1)))
    dpath = os.path.join(out_dir, "tenants.parquet")
    if not os.path.exists(dpath):
        pq.write_table(gen_tenants(seed=7), dpath)
    return out_dir
