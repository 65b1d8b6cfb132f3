"""Seeded synthetic transcripts fixture generator (FIXTURES.md §1).

Produces the canonical transcripts schema with the three adversarial
properties the streaming paths are tested against:

- **skew**: conversation sizes ~ Zipf; one hot conversation holds ~10%
  of all turns (exercises salted repartitioning),
- **late data**: ~5% of rows have ts shifted late by 1–120 s relative
  to turn order (exercises watermarks),
- **duplicates**: ~1% of (conv_id, turn_idx) rows duplicated with
  identical text (exercises dedup under watermark).

Everything is a pure function of ``seed`` (numpy PCG64) — reruns and
different cluster sizes see identical data. No external data.
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pandas as pd

_ROLES = np.array(["user", "assistant", "tool", "system"])
_TOOLS = np.array(["search", "calc", "code"])

BASE_TS = datetime(2024, 3, 1, tzinfo=timezone.utc)


def make_transcripts_pdf(
    n_turns: int = 6000,
    n_convs: int = 200,
    seed: int = 42,
    hot_frac: float = 0.10,
    late_frac: float = 0.05,
    dup_frac: float = 0.01,
    mean_gap_s: float = 30.0,
    role_mode: str = "cycle",
) -> pd.DataFrame:
    """Build the fixture as a pandas DataFrame (ts is tz-naive UTC, to
    match Spark's session-UTC timestamps).

    ``role_mode="cycle"`` (default) rotates roles u/a/t/s by global row
    position — within a conversation the sequence never repeats a role,
    which is degenerate for sequence-pattern (CEP) tests.
    ``role_mode="hash"`` picks each turn's role from md5(conv, turn)
    like the canonical transcripts derivation's event_id-driven roles,
    so runs and repeats occur."""
    rng = np.random.default_rng(seed)

    # conversation sizes: one hot conv + Zipf-ish tail over the rest
    hot = int(n_turns * hot_frac)
    rest = n_turns - hot
    weights = 1.0 / np.arange(1, n_convs)  # conv 1..n-1
    weights /= weights.sum()
    sizes = rng.multinomial(rest, weights)
    conv_sizes = np.concatenate([[hot], sizes])

    conv_ids = np.repeat(
        np.array([f"conv-{i:06d}" for i in range(n_convs)]), conv_sizes
    )
    turn_idx = np.concatenate([np.arange(s, dtype=np.int32) for s in conv_sizes])

    n = len(conv_ids)
    if role_mode == "hash":
        import hashlib

        picks = [
            int(hashlib.md5(f"{c}-{t}".encode()).hexdigest(), 16) % 4
            for c, t in zip(conv_ids, turn_idx)
        ]
        roles = _ROLES[np.array(picks)]
    else:
        roles = _ROLES[np.arange(n) % 4]
    # per-conversation monotone ts: conv start offset + cumulative gaps
    conv_start = rng.uniform(0, 3600 * 24, size=n_convs)
    gaps = rng.exponential(mean_gap_s, size=n)
    # conv_ids is grouped contiguously, so a grouped cumsum is vectorizable
    ts_s = (
        np.repeat(conv_start, conv_sizes)
        + pd.Series(gaps).groupby(pd.Series(conv_ids)).cumsum().to_numpy()
    )
    # late shuffle: push ~late_frac rows later in event time by 1-120 s
    late_mask = rng.random(n) < late_frac
    ts_s = ts_s + late_mask * rng.uniform(1, 120, size=n)

    k = rng.integers(0, 100, size=n)
    email = np.where(
        np.arange(n) % 7 == 0,
        np.char.add(
            np.char.add(" contact user", np.arange(n).astype(str)), "@example.com"
        ),
        "",
    )
    text = np.array(
        [
            f"turn {t} of {c}: sample k={kv}{e}"
            for t, c, kv, e in zip(turn_idx, conv_ids, k, email)
        ]
    )
    tool = np.where(roles == "tool", _TOOLS[np.arange(n) % 3], "")

    pdf = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles,
            "text": text,
            "tool": tool,
            "ts": pd.Timestamp(BASE_TS).tz_localize(None)
            + pd.to_timedelta(ts_s, unit="s"),
        }
    )

    # duplicates: identical rows re-appended
    n_dup = int(n * dup_frac)
    if n_dup:
        dup_rows = pdf.iloc[rng.choice(n, n_dup, replace=False)]
        pdf = pd.concat([pdf, dup_rows], ignore_index=True)

    # arrival order: shuffle within a bounded horizon (simulates out-of-
    # order arrival without unbounded disorder)
    perm = rng.permutation(len(pdf))
    pdf = pdf.iloc[perm].reset_index(drop=True)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf


def write_transcripts_parquet(
    out_dir: str,
    n_files: int = 4,
    time_ordered: bool = True,
    start_file_idx: int = 0,
    **kwargs,
) -> pd.DataFrame:
    """Write the fixture as ``n_files`` parquet files (so a file-stream
    source sees multiple triggers). With ``time_ordered`` (default) the
    files are chunked in rough event-time order — arrival ≈ event time,
    like a real stream — while rows *within* a file stay shuffled, so
    bounded out-of-orderness still exercises the watermark. With
    ``time_ordered=False`` the disorder is unbounded (adversarial).
    Returns the full pdf."""
    import pathlib

    pdf = make_transcripts_pdf(**kwargs)
    path = pathlib.Path(out_dir)
    path.mkdir(parents=True, exist_ok=True)
    if time_ordered:
        order = np.argsort(pdf["ts"].to_numpy(), kind="stable")
        chunks = np.array_split(order, n_files)
        rng = np.random.default_rng(kwargs.get("seed", 42))
        chunks = [idx[rng.permutation(len(idx))] for idx in chunks]
    else:
        chunks = np.array_split(np.arange(len(pdf)), n_files)
    for i, idx in enumerate(chunks):
        # start_file_idx offsets the filenames so a SECOND batch can be
        # appended to a dir a file-stream source is already watching
        pdf.iloc[idx].to_parquet(
            path / f"part-{start_file_idx + i:04d}.parquet", index=False
        )
    return pdf
