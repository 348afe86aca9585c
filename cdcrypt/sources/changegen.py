"""Deterministic binlog/WAL-shaped change-event generator (FIXTURES.md F2).

Produces the engine's input: epoch-sequenced parquet files of change events
over the ``transcripts`` schema (BASELINE.json input_hint):

    op(I|U|D), conv_id, turn_idx, op_seq, epoch, role, text, tool, ts
    [+ model from the schema-evolution epoch onward]

The reference consumes records from a Debezium-style CDC source
(``README.md:20``); the sandbox has no Kafka JAR, so epochs-as-files stand in
for topic offsets (SURVEY.md P1). Generation is numpy-vectorized and seeded —
identical bytes for identical parameters — so the bench input is reproducible
and the pure-Python/DuckDB oracle can be computed from the same files.

Adversarial properties (all required by FIXTURES.md F2):
- exact duplicate deliveries of the same (conv_id, turn_idx, op_seq), ~2%,
  half pushed across an epoch boundary;
- out-of-order op_seq within an epoch (events shuffled within a window);
- hot keys: conv 0 receives >= 5% of all events (zipf-ish skew -> exercises
  explicit salting in the measured run, BASELINE.md note);
- delete-then-reinsert sequences;
- schema evolution: files from ``evolve_epoch`` onward carry an added
  nullable ``model`` column; earlier files do NOT have the column.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ROLES = np.array(["user", "assistant", "tool"])
_FILLER = np.array(
    [
        "the quick brown fox jumps over the lazy dog. ",
        "pack my box with five dozen liquor jugs — quickly! ",
        "σχεδόν όλα τα ελληνικά γράμματα εδώ ✓ ",
        "日本語のテキストサンプルです。エンジンのテスト用。",
        "zero-width and emoji 🧪🚀 mixed content sample. ",
        "SELECT * FROM conversations WHERE turn > 0; ",
        "",  # empty-string case
    ]
)
_MODELS = np.array(["m-alpha", "m-beta", "m-gamma"])
_BASE_TS = np.int64(1_700_000_000) * 1_000_000  # 2023-11-14 UTC, microseconds


@dataclass
class GenSpec:
    n_convs: int = 200
    avg_turns: int = 12  # geometric mean-ish, capped at 200
    update_ratio: float = 0.35  # updates per insert
    delete_ratio: float = 0.07  # deletes per insert
    reinsert_ratio: float = 0.5  # fraction of deletes later re-inserted
    dup_ratio: float = 0.02  # duplicated deliveries
    n_epochs: int = 8
    evolve_epoch: int | None = None  # default: 3/4 through
    hot_conv_boost: float = 0.08  # fraction of updates forced onto conv 0
    long_text_ratio: float = 0.002  # >16 KB texts
    null_text_ratio: float = 0.01
    text_repeat: int = 1  # filler repetitions (scales avg text bytes)
    # Debezium transaction metadata (streaming/txn.py consumer): fraction
    # of multi-event logical runs tagged with a shared txn_id + the
    # event-count txn_total. 0.0 (default) omits the columns entirely —
    # byte-identical output to the pre-txn generator. Tagged runs are
    # CONSECUTIVE in logical order, so boundary txns straddle epochs
    # (the hold-and-release case) and duplicates redeliver the metadata
    # verbatim (exact redelivery, incl. retired-txn stragglers).
    txn_ratio: float = 0.0
    txn_max: int = 8  # max events per transaction
    seed: int = 42


def _texts(conv: np.ndarray, turn: np.ndarray, seq: np.ndarray,
           rng: np.random.Generator, spec: GenSpec) -> np.ndarray:
    """Deterministic text from (conv, turn, seq): short header + filler.

    Object-array construction via a precomputed (filler x reps) table plus one
    list-comprehension pass: ``np.char`` elementwise string ops over millions
    of rows allocate multi-GB fixed-width unicode arrays and ran ~100x slower
    (17 min / 11 GB at sf0.1) — this path generates 3.3M events in seconds.
    """
    n_reps = max(1, 2 * spec.text_repeat)
    h = (conv.astype(np.int64) * 1_000_003 + turn * 8191 + seq * 131) % len(_FILLER)
    if spec.text_repeat > 1:
        # vary length 1..2*repeat deterministically (realistic turn sizes)
        reps = ((conv + turn * 3 + seq) % n_reps).astype(np.int64)
    else:
        reps = np.zeros(len(conv), dtype=np.int64)
    # one table entry per (filler, rep) pair; indexing an object array is C-speed
    table = np.empty(len(_FILLER) * n_reps, dtype=object)
    for fi, f in enumerate(_FILLER):
        for r in range(n_reps):
            table[fi * n_reps + r] = f * (r + 1)
    fillers = table[h * n_reps + reps]
    out = np.array(
        [f"c{c} t{t} s{s} :: {fl}" for c, t, s, fl in
         zip(conv.tolist(), turn.tolist(), seq.tolist(), fillers.tolist())],
        dtype=object,
    )
    n = len(out)
    long_mask = rng.random(n) < spec.long_text_ratio
    if long_mask.any():
        big = "L" * 17000
        for i in np.flatnonzero(long_mask):
            out[i] = str(out[i]) + big
    null_mask = rng.random(n) < spec.null_text_ratio
    out[null_mask] = None
    return out


def generate_change_events(spec: GenSpec) -> dict:
    """Build the full logical event sequence as numpy/object arrays.

    Returns dict of columns + the per-event epoch assignment. Event order in
    the arrays is DELIVERY order (shuffled); ``op_seq`` is the logical order.
    """
    rng = np.random.default_rng(spec.seed)

    # --- base inserts: every (conv, turn) gets an I
    sizes = np.minimum(rng.geometric(1.0 / spec.avg_turns, spec.n_convs), 200)
    sizes[0] = max(sizes[0], 150)  # hot conversation is long too
    conv_i = np.repeat(np.arange(spec.n_convs), sizes)
    turn_i = np.concatenate([np.arange(s) for s in sizes])
    n_ins = len(conv_i)

    # key index table for picking update/delete targets
    n_upd = int(n_ins * spec.update_ratio)
    n_del = int(n_ins * spec.delete_ratio)

    pick_u = rng.integers(0, n_ins, n_upd)
    # force a share of updates onto the hot conversation (conv 0)
    hot_rows = np.flatnonzero(conv_i == 0)
    n_hot = int(n_upd * spec.hot_conv_boost) + int(0.05 * (n_ins + n_upd + n_del))
    pick_u = np.concatenate([pick_u, rng.choice(hot_rows, n_hot)])
    n_upd = len(pick_u)

    pick_d = rng.choice(n_ins, n_del, replace=False)
    n_rei = int(n_del * spec.reinsert_ratio)
    pick_r = pick_d[:n_rei]  # delete-then-reinsert keys

    op = np.concatenate([
        np.full(n_ins, "I"), np.full(n_upd, "U"),
        np.full(n_del, "D"), np.full(n_rei, "I"),
    ])
    conv = np.concatenate([conv_i, conv_i[pick_u], conv_i[pick_d], conv_i[pick_r]])
    turn = np.concatenate([turn_i, turn_i[pick_u], turn_i[pick_d], turn_i[pick_r]])
    n = len(op)

    # --- logical order: inserts first-ish, then interleaved U/D/reinsert.
    # A stable global order that keeps I-before-U/D per key: sort by
    # (phase, rand) where phase(I base)=0, others get a random phase in [1,4).
    phase = np.concatenate([
        np.zeros(n_ins), rng.uniform(1, 4, n_upd),
        rng.uniform(1, 3, n_del),
        rng.uniform(3, 4, n_rei),  # reinserts strictly after their delete window
    ])
    order = np.argsort(phase, kind="stable")
    op, conv, turn = op[order], conv[order], turn[order]
    op_seq = np.arange(n, dtype=np.int64)  # logical LWW order == this order

    # --- epochs: contiguous in logical order, then shuffle WITHIN epoch for
    # out-of-order op_seq delivery
    epoch = (op_seq * spec.n_epochs // n).astype(np.int64)

    # --- after-images
    role = _ROLES[(conv * 7 + turn) % 3]
    text = _texts(conv, turn, op_seq, rng, spec)
    tool_table = np.array([f'{{"name":"tool_{i}"}}' for i in range(17)], dtype=object)
    tool = np.where(role == "tool", tool_table[conv % 17], None)
    ts = _BASE_TS + conv.astype(np.int64) * 10_000_000 + turn.astype(np.int64) * 1000 + op_seq
    is_d = op == "D"
    text[is_d] = None
    role = role.astype(object); role[is_d] = None
    tool[is_d] = None

    evolve_epoch = spec.evolve_epoch
    if evolve_epoch is None:
        evolve_epoch = max(1, spec.n_epochs * 3 // 4)
    model = _MODELS[(conv + turn) % 3].astype(object)
    model[is_d] = None
    model[epoch < evolve_epoch] = None  # pre-evolution events carry no model

    # --- transaction tagging (Debezium transaction block): consecutive
    # logical runs of size 1..txn_max; runs of >= 2 events are tagged with
    # probability txn_ratio. Arrays are in logical order here (op_seq ==
    # position), so a tagged run is a contiguous op_seq range and epoch
    # assignment below naturally leaves some txns straddling boundaries.
    txn_id_arr = txn_total_arr = None
    if spec.txn_ratio > 0:
        run_sizes = rng.integers(1, spec.txn_max + 1, n)  # overshoot, cut
        ends = np.cumsum(run_sizes)
        k = int(np.searchsorted(ends, n)) + 1
        run_sizes = run_sizes[:k].copy()
        covered_before_last = int(ends[k - 2]) if k > 1 else 0
        run_sizes[-1] = n - covered_before_last
        starts = np.concatenate([[0], np.cumsum(run_sizes)[:-1]])
        tagged_run = (rng.random(k) < spec.txn_ratio) & (run_sizes >= 2)
        run_of = np.repeat(np.arange(k), run_sizes)
        txn_id_arr = np.full(n, None, dtype=object)
        txn_total_arr = np.full(n, None, dtype=object)
        pos = np.flatnonzero(tagged_run[run_of])
        txn_id_arr[pos] = [f"txn{int(s):010d}"
                           for s in starts[run_of[pos]].tolist()]
        txn_total_arr[pos] = run_sizes[run_of[pos]].tolist()

    # --- duplicates: exact redelivery (same op_seq & payload), half next epoch
    n_dup = int(n * spec.dup_ratio)
    di = rng.integers(0, n, n_dup)
    dup_epoch = epoch[di] + (rng.random(n_dup) < 0.5).astype(np.int64)
    dup_epoch = np.minimum(dup_epoch, spec.n_epochs - 1)

    cols = {
        "op": np.concatenate([op, op[di]]).astype(object),
        "conv_id": None,  # filled below
        "turn_idx": np.concatenate([turn, turn[di]]).astype(np.int32),
        "op_seq": np.concatenate([op_seq, op_seq[di]]),
        "epoch": np.concatenate([epoch, dup_epoch]),
        "role": np.concatenate([role, role[di]]),
        "text": np.concatenate([text, text[di]]),
        "tool": np.concatenate([tool, tool[di]]),
        "ts": np.concatenate([ts, ts[di]]),
        "model": np.concatenate([model, model[di]]),
    }
    conv_all = np.concatenate([conv, conv[di]])
    conv_id_table = np.array(
        [f"conv{i:08d}" for i in range(spec.n_convs)], dtype=object)
    cols["conv_id"] = conv_id_table[conv_all]
    if txn_id_arr is not None:
        # duplicates carry the txn block verbatim — exact redelivery; the
        # half pushed one epoch late includes post-release stragglers
        # (the aligner's retired-window case)
        cols["txn_id"] = np.concatenate([txn_id_arr, txn_id_arr[di]])
        cols["txn_total"] = np.concatenate(
            [txn_total_arr, txn_total_arr[di]])

    # duplicates that landed in a later epoch keep pre-evolution nulls only if
    # their ORIGINAL epoch was pre-evolution — exact redelivery, same payload.
    cols["_evolve_epoch"] = evolve_epoch
    return cols


def write_epoch_files(cols: dict, out_dir: str, shuffle_seed: int = 7,
                      files_per_epoch: int = 1, fmt: str = "parquet") -> list[str]:
    """Write per-epoch change files (delivery order shuffled within epoch).

    ``fmt``: 'parquet' (bench/default) or 'jsonl' (newline-delimited JSON —
    the other wire shape a binlog tail commonly lands as, SURVEY P1). The
    same generator stream in either format replays to the identical final
    table (tested).

    Pre-evolution epochs omit the ``model`` column entirely (schema
    evolution on read). Returns the written paths in epoch order.
    """
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"unsupported epoch file format {fmt!r}")
    os.makedirs(out_dir, exist_ok=True)
    evolve_epoch = cols["_evolve_epoch"]
    epochs = np.unique(cols["epoch"])
    rng = np.random.default_rng(shuffle_seed)
    paths = []
    base_fields = ["op", "conv_id", "turn_idx", "op_seq", "epoch",
                   "role", "text", "tool", "ts"]
    if "txn_id" in cols:
        base_fields += ["txn_id", "txn_total"]
    for e in epochs:
        m = cols["epoch"] == e
        idx = np.flatnonzero(m)
        rng.shuffle(idx)  # out-of-order op_seq within the epoch
        fields = base_fields + (["model"] if e >= evolve_epoch else [])
        # build arrays PER FILE CHUNK, not per epoch: a 10x-scale epoch's
        # text column exceeds pyarrow's int32 string offsets (~2 GB) as one
        # array ("offset overflow while concatenating arrays"); chunked
        # construction also skips the epoch-wide take()
        chunks = np.array_split(idx, files_per_epoch)
        for fi, ch in enumerate(chunks):
            arrays = []
            for f in fields:
                v = cols[f][ch]
                if f == "ts":
                    arrays.append(pa.array(v, type=pa.timestamp("us")))
                elif f == "turn_idx":
                    arrays.append(pa.array(v, type=pa.int32()))
                elif f in ("op_seq", "epoch", "txn_total"):
                    arrays.append(pa.array(v, type=pa.int64()))
                else:
                    arrays.append(pa.array(v, type=pa.string()))
            part = pa.table(dict(zip(fields, arrays)))
            stem = os.path.join(out_dir, f"epoch={int(e):06d}.part{fi:03d}")
            if fmt == "parquet":
                p = stem + ".parquet"
                pq.write_table(part, p, compression="snappy")
            else:
                p = stem + ".jsonl"
                part.to_pandas().to_json(
                    p, orient="records", lines=True,
                    date_format="iso", date_unit="us")
            paths.append(p)
    return paths


def generate_to_dir(out_dir: str, spec: GenSpec | None = None,
                    files_per_epoch: int = 1) -> dict:
    """Generate + write; returns summary stats for logging/bench.

    Cyclic GC is suspended for the duration: the generator materializes
    millions of Python strings and repeated full-heap GC passes made the
    sf0.1 build ~2x slower (no cycles are created here)."""
    import gc
    spec = spec or GenSpec()
    was_enabled = gc.isenabled()
    gc.disable()
    try:
        cols = generate_change_events(spec)
        paths = write_epoch_files(cols, out_dir, files_per_epoch=files_per_epoch)
    finally:
        if was_enabled:
            gc.enable()
    n = len(cols["op"])
    hot = (np.char.find(cols["conv_id"].astype("U16"), "conv00000000") == 0).sum()
    return {
        "events": int(n),
        "epochs": int(cols["epoch"].max() + 1),
        "evolve_epoch": int(cols["_evolve_epoch"]),
        "hot_conv_share": float(hot / n),
        "files": paths,
    }
