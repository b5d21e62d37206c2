"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §1.1) — streaming is an
extension the Spark build adds: the same per-series expressions run
over windowed event streams with watermarks for late data.

Patterns provided:
* stream_tumbling_paa — tumbling event-time windows -> per-window mean
  (the streaming twin of PAA segments);
* stream_zscore — sliding-window aggregate stats joined back to events
  (streaming z-normalization against a trailing window);
* stream_envelope — per-key running min/max over a sliding window
  (streaming LB_Keogh envelope);
* stream_running_zscore — CUSTOM STATEFUL operator
  (applyInPandasWithState): per-key Welford running stats + online
  anomaly flags; state is 3 floats per key regardless of stream length.
* stream_ann_lsh_candidates — streaming hyperplane-LSH ANN candidates
  with Lv'07 multi-probe (probe enumeration shared with the batch
  lsh_topk via pipeline.simsearch.probe_masks): probes widen the query
  side only, the stored bucket index is capped at n_tables x 2^bits.

The window ops are plain readStream->transform->writeStream graphs with
state in the streaming aggregation store, sized by (keys x
windows-in-watermark); the stateful op's store is (keys x 3 doubles).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_tumbling_paa(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window per-key mean — streaming PAA segment values.

    Works identically on a batch DataFrame (unit tests use batch mode);
    on a stream add .withWatermark + writeStream in the caller.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.col(key_col), F.window(ts_col, window_duration).alias("win"))
        .agg(
            F.avg(value_col).alias("segment_mean"),
            F.count("*").alias("n_events"),
        )
        .select(
            key_col,
            F.col("win.start").alias("win_start"),
            "segment_mean",
            "n_events",
        )
    )


def stream_envelope(
    events: DataFrame,
    window_duration: str = "2 minutes",
    slide: str = "1 minute",
    watermark: str = "4 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Sliding-window min/max per key — the streaming LB_Keogh envelope."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.col(key_col), F.window(ts_col, window_duration, slide).alias("win"))
        .agg(
            F.min(value_col).alias("env_lower"),
            F.max(value_col).alias("env_upper"),
        )
        .select(
            key_col,
            F.col("win.start").alias("win_start"),
            "env_lower",
            "env_upper",
        )
    )


def stream_running_zscore(
    events: DataFrame,
    threshold: float = 3.0,
    min_obs: int = 10,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key ONLINE z-score anomaly flags — a custom stateful operator.

    No built-in streaming construct expresses "running stats over the
    whole history of a key" (windows bound state by time); this is the
    applyInPandasWithState case: state per key = Welford (n, mean, M2),
    three numbers regardless of stream length, updated per micro-batch.
    Each event is scored against the statistics of the events BEFORE it
    (so the first points of a burst are judged by history, not by the
    burst itself), then folded into the state.

    Batch twin (same semantics, SQL window functions): the
    events_running_zscore driver query — use it to validate results.

    ``idle_timeout_ms``: drop a key's Welford state after that much
    processing time without new events.  Per-key state is three numbers,
    so the unbounded axis at 100 TB is the KEY population — long-lived
    jobs evict churned-out keys; a re-appearing key restarts its
    statistics cold.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} long, {ts_col} timestamp, {value_col} double, "
        "z double, is_anomaly boolean"
    )
    state_schema = "n long, mean double, m2 double"
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def score(key, pdfs, state: GroupState):
        if idle_timeout_ms and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                columns=[key_col, ts_col, value_col, "z", "is_anomaly"]
            )
            return
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                v = float(v)
                std = math.sqrt(m2 / (n - 1)) if n > 1 else 0.0
                z = (v - mean) / std if std > 0.0 else 0.0
                out_rows.append(
                    (key[0], ts, v, z, bool(abs(z) > threshold and n >= min_obs))
                )
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
        state.update((n, mean, m2))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            out_rows, columns=[key_col, ts_col, value_col, "z", "is_anomaly"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        score, out_schema, state_schema, "append", timeout_conf
    )


def stream_matrix_profile(
    events: DataFrame,
    subsequence_length: int = 8,
    horizon: int = 256,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    idle_timeout_ms: int | None = None,
    scale: bool = True,
) -> DataFrame:
    """Per-key ONLINE matrix profile — streaming discord detection.

    For each arriving point, the newest closed subsequence (the last
    ``m`` values) is scored against every earlier subsequence inside a
    bounded ``horizon``, with the same exclusion band as the batch
    operator (|i-j| <= ceil(m/4), matrix_profile.py:192-197): the
    emitted ``mp`` is that minimum distance.  High mp = the pattern just
    seen never occurred in the recent past (a discord); low mp = a
    recurring motif.

    No built-in streaming construct expresses "compare against all
    prior subsequences" (joins/windows bound pairs by time equality,
    not by pattern offset); this is the applyInPandasWithState case:
    state per key = the last ``horizon + m - 1`` raw values — bounded
    regardless of stream length.  Emits one row per point that closes a
    subsequence with at least one comparable predecessor.

    ``idle_timeout_ms``: per-key state is dropped after that much
    processing time without new events — at 100 TB the KEY population is
    the unbounded axis (per-key state is already bounded), so long-lived
    jobs should evict churned-out keys; a re-appearing key simply
    restarts its horizon cold.

    ``scale`` mirrors the batch operator's default (transform /
    matrix_profile_np, matrix_profile.py:185): every window — the newest
    and each history window — is z-normalized (mean 0, std 1; std 0 ->
    1) before the distance, so streaming mp values are comparable to
    batch profiles.  scale=False scores raw windows.

    Batch twin for validation: ``matrix_profile_np`` restricted to
    j < i within the horizon (see the unit test's numpy replay).
    """
    import numpy as np
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    m = subsequence_length
    band = int(np.ceil(m / 4.0))
    keep = horizon + m - 1
    out_schema = f"{key_col} long, {ts_col} timestamp, mp double"
    state_schema = "buf array<double>"
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def score(key, pdfs, state: GroupState):
        if idle_timeout_ms and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=[key_col, ts_col, "mp"])
            return
        buf = list(state.get[0]) if state.exists else []
        out_ts, out_mp = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                buf.append(float(v))
                if len(buf) > keep:
                    buf = buf[-keep:]
                n = len(buf)
                if n < m + band + 1:
                    continue
                arr = np.asarray(buf, dtype=np.float64)
                w_new = arr[n - m:]
                # earlier windows start at 0..n-m-1; newest starts at n-m;
                # exclusion: skip starts within `band` of the newest
                n_prev = n - m - band
                if n_prev <= 0:
                    continue
                idx = np.arange(m)[None, :] + np.arange(n_prev)[:, None]
                W = arr[idx]
                if scale:
                    mu = W.mean(axis=1, keepdims=True)
                    sd = W.std(axis=1, keepdims=True)
                    sd[sd == 0.0] = 1.0
                    W = (W - mu) / sd
                    nsd = w_new.std()
                    w_new = (w_new - w_new.mean()) / (nsd if nsd > 0 else 1.0)
                d2 = ((W - w_new[None, :]) ** 2).sum(axis=1)
                out_ts.append(ts)
                out_mp.append(float(np.sqrt(d2.min())))
        state.update((buf,))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        if out_ts:
            yield pd.DataFrame(
                {key_col: [key[0]] * len(out_ts), ts_col: out_ts, "mp": out_mp}
            )
        else:
            yield pd.DataFrame(columns=[key_col, ts_col, "mp"])

    return events.groupBy(key_col).applyInPandasWithState(
        score, out_schema, state_schema, "append", timeout_conf
    )


def stream_exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming exact dedup — first-seen wins, per content hash.

    The streaming twin of ``pipeline.dedup.exact_duplicates``: state per
    md5(normalized text) is the single first-seen doc id (one long per
    distinct content — the minimum possible dedup state), and only
    first-seen documents are emitted downstream.  Late duplicates are
    dropped forever; a training-data ingest pipeline puts this right
    after the source so duplicate payloads never reach feature
    extraction.

    Batch twin for validation (same first-seen-by-min-id semantics on a
    static frame): the ``stream_exact_dedup_batch`` driver query.  Works
    on batch DataFrames via groupBy(hash) -> min id when the input is
    not streaming.

    ``ttl_ms`` bounds state for unbounded corpora — the same trade
    Spark's own ``dropDuplicatesWithinWatermark`` makes: a hash whose
    content hasn't recurred for ``ttl_ms`` of processing time is
    forgotten, so a duplicate arriving later than the TTL is re-admitted
    (dedup-within-horizon).  At 100 TB the hash population is the
    unbounded axis (per-key state is already one long), so forever-exact
    dedup means unbounded state; TTL caps it at the active working set.
    """
    hashed = docs.select(
        F.col(id_col), F.col(text_col),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("_h"),
    )
    if not docs.isStreaming:
        # batch mode: first-seen = smallest id per hash, same output schema
        from pyspark.sql import Window

        w = Window.partitionBy("_h").orderBy(F.col(id_col).asc())
        return (
            hashed.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(id_col, text_col)
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{id_col} long, {text_col} string"
    state_schema = "first_id long"
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def keep_first(key, pdfs, state: GroupState):
        if ttl_ms and state.hasTimedOut:
            state.remove()  # hash forgotten: a later duplicate re-admits
            yield pd.DataFrame(columns=[id_col, text_col])
            return
        if state.exists:
            if ttl_ms:  # activity re-arms the idle TTL
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(columns=[id_col, text_col])
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            row = pdf.loc[pdf[id_col].idxmin()]
            if best is None or row[id_col] < best[id_col]:
                best = row
        if best is None:
            yield pd.DataFrame(columns=[id_col, text_col])
            return
        state.update((int(best[id_col]),))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({id_col: [best[id_col]], text_col: [best[text_col]]})

    return hashed.groupBy("_h").applyInPandasWithState(
        keep_first, out_schema, state_schema, "append", timeout_conf
    )


def stream_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    n_shingle: int = 1,
    seed: int = 42,
    bucket_cap: int = 8,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming MinHash-LSH near-dup candidates — the streaming twin of
    ``pipeline.dedup.minhash_lsh_candidates``.

    Each document's MinHash signature is computed IN the projection (a
    pandas UDF over the text — no pre-shuffle, unlike the batch
    explode+groupBy form, so it composes with the stateful stage), then
    split into ``bands`` band signatures; the stateful stage groups by
    exact band key and keeps the first ``bucket_cap`` doc ids seen per
    bucket.  A document landing in a non-empty bucket emits one
    ``(band, id1, id2)`` candidate row per stored prior (id1 = earlier
    doc) — the classic LSH S-curve semantics, restricted to
    earlier-vs-later pairs as a stream must be.  Candidates repeat
    across bands (no global distinct exists in a single stateful pass);
    downstream verification dedupes.

    State per bucket is at most ``bucket_cap`` longs — bounded by
    design; as with the other stateful ops the unbounded axis at 100 TB
    is the BUCKET population, capped by ``ttl_ms`` idle eviction (a
    bucket idle that long is forgotten; later members re-seed it).

    Batch mode (non-streaming input) replays the identical contract —
    bucket members ordered by id, pairs (ids[i], ids[j]) for i < j with
    i < bucket_cap — so batch output == collected stream output on the
    same data (the equivalence unit test).

    Signature parity: tokenization (lowercase, non-alphanumeric split,
    ' '-joined shingles), 28-bit md5 token ids, and the LCG (a, b)
    coefficients replicate pipeline.dedup.minhash_signatures exactly.
    """
    import hashlib
    import re

    from tslearn_spark.pipeline.dedup import MINHASH_P, minhash_coefficients

    assert num_hashes % bands == 0
    r = num_hashes // bands
    coefs = minhash_coefficients(num_hashes, seed)

    def _band_keys(text: str) -> list[str]:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        if n_shingle > 1:
            toks = [" ".join(toks[i:i + n_shingle])
                    for i in range(max(len(toks) - n_shingle, 0) + 1)]
        if not toks:
            return []
        tids = {int(hashlib.md5(t.encode()).hexdigest()[:7], 16) for t in toks}
        sig = [min((a * x + b) % MINHASH_P for x in tids) for a, b in coefs]
        return [f"{b}:" + "_".join(str(v) for v in sig[b * r:(b + 1) * r])
                for b in range(bands)]

    # mapInPandas explodes inside the UDF: a pandas_udf + explode plan
    # evaluates the signature UDF TWICE (once for the generate's
    # null/size filter, once for the projection) — one pass here
    def _expand(batches):
        for pdf in batches:
            ids: list[int] = []
            keys: list[str] = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                for bk in _band_keys(t or ""):
                    ids.append(int(i))
                    keys.append(bk)
            yield pd.DataFrame({id_col: ids, "bkey": keys})

    banded = docs.select(id_col, text_col).mapInPandas(
        _expand, f"{id_col} long, bkey string"
    )

    if not docs.isStreaming:
        # one grouped aggregate + in-row pair expansion: the signature
        # UDF runs ONCE and the plan has a single shuffle (a ranked
        # self-join would re-evaluate the UDF subtree per side and
        # shuffle twice).  A degenerate bucket (huge near-identical
        # cluster) concentrates on one task either way — the same skew
        # the streaming state group has; cap emitted pairs via
        # bucket_cap as in streaming.
        grouped = banded.groupBy("bkey").agg(
            F.sort_array(F.collect_list(id_col)).alias("ids")
        )
        return (
            grouped.select(
                F.split("bkey", ":")[0].cast("int").alias("band"),
                F.explode(F.expr(
                    f"flatten(transform(slice(ids, 1, {bucket_cap}), x -> "
                    "transform(filter(ids, y -> y > x), y -> "
                    "struct(x AS id1, y AS id2))))"
                )).alias("p"),
            )
            .select("band", "p.id1", "p.id2")
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "band int, id1 long, id2 long"
    state_schema = "ids array<long>"
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def match(key, pdfs, state: GroupState):
        if ttl_ms and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["band", "id1", "id2"])
            return
        band = int(key[0].split(":", 1)[0])
        ids = list(state.get[0]) if state.exists else []
        rows = []
        new_ids = sorted(
            int(i) for pdf in pdfs for i in pdf[id_col].tolist()
        )
        for nid in new_ids:
            rows.extend((band, pid, nid) for pid in ids[:bucket_cap])
            if len(ids) < bucket_cap:
                ids.append(nid)
        state.update((ids,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(rows, columns=["band", "id1", "id2"])

    return banded.groupBy("bkey").applyInPandasWithState(
        match, out_schema, state_schema, "append", timeout_conf
    )


def stream_ann_lsh_candidates(
    vectors: DataFrame,
    dim: int,
    bits: int = 12,
    n_tables: int = 4,
    n_probes: int | str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    bucket_cap: int = 8,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming hyperplane-LSH ANN candidates — the streaming twin of
    ``pipeline.simsearch.lsh_topk``'s candidate stage, WITH the Lv'07
    query-directed multi-probe the batch path gained in r10 (shared
    enumeration: probe_masks — both sides probe the same buckets for
    the same vector).

    Each arriving vector is hashed once per table (home bucket) and,
    with ``n_probes`` > 1, additionally PROBES its n_probes-1 nearest
    bit-flip buckets.  The stateful stage groups by (t, bucket); an
    arriving probe row emits one ``(t, id1, id2)`` candidate per stored
    prior (id1 = earlier vector), but ONLY the home row may append the
    vector to the bucket's state (first ``bucket_cap`` ids).  So the
    query side widens n_probes x while the stateful bucket index is
    byte-identical to single-probe — multi-probe recall at unchanged
    state size, the property that makes it the streaming-corpus scale
    lever (no trained quantizer, no index replication).  This is why
    IVF has no streaming twin here: its quantizer needs a training pass
    the stream never gets.

    State per bucket: at most ``bucket_cap`` longs; the unbounded axis
    is the bucket population, capped by ``ttl_ms`` idle eviction.
    Candidates may repeat across tables/probes (no global distinct in a
    single stateful pass); downstream verification dedupes.

    Batch mode (non-streaming input) replays the identical contract for
    ids processed in ascending order: stored = first bucket_cap HOME
    members by id; a prober x pairs with stored y < x.

    Defaults (r13): ``n_probes="auto"`` resolves to
    ``auto_lsh_probes(bits)`` (~8*bits/3) — the measured recipe from
    the r12 recall sweep, where b9/t4/p24 reached 0.974 candidate
    recall on the clustered corpus at a 2048-row state bound while the
    old p=1 default sat at 0.26 on the same index.  Probes cost
    query-side compute, never state, so the high-recall config is the
    right default; pick ``bits`` ~ auto_lsh_bits(expected corpus
    size) + 2 (the stream itself cannot be counted up front).

    .. versionchanged:: r13
        The default ``n_probes`` changed from ``1`` to ``"auto"``
        (~8*bits/3, e.g. 32 probes at bits=12).  Per-query probe work
        — hash comparisons and emitted candidate rows — grows by that
        factor at unchanged state; callers tuned to the old p=1
        latency/candidate-volume profile must pass ``n_probes=1``
        explicitly to keep it.
    """
    import numpy as np

    from tslearn_spark.pipeline.simsearch import (
        _hyperplanes, auto_lsh_probes, probe_masks,
    )

    if n_probes == "auto":
        n_probes = auto_lsh_probes(bits)

    planes_all = [
        np.asarray(_hyperplanes(dim, bits, seed + 1000 * t),
                   dtype=np.float64)
        for t in range(n_tables)
    ]
    pw2 = (1 << np.arange(bits, dtype=np.int64))

    def _expand(batches):
        for pdf in batches:
            ids, ts_, buckets, homes_ = [], [], [], []
            if len(pdf) > 0:
                V = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                vid = pdf[id_col].to_numpy()
                for t, P in enumerate(planes_all):
                    D = V @ P.T
                    home = ((D > 0) * pw2).sum(axis=1)
                    for i in range(len(V)):
                        for p, m in enumerate(
                                probe_masks(np.abs(D[i]), bits, n_probes)):
                            ids.append(int(vid[i]))
                            ts_.append(t)
                            buckets.append(int(home[i]) ^ m)
                            homes_.append(p == 0)
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "t": pd.Series(ts_, dtype="int32"),
                "bucket": pd.Series(buckets, dtype="int64"),
                "is_home": pd.Series(homes_, dtype="bool"),
            })

    banded = vectors.select(id_col, vec_col).mapInPandas(
        _expand, f"{id_col} long, t int, bucket long, is_home boolean"
    )

    if not vectors.isStreaming:
        # batch twin: stored = first bucket_cap home ids (ascending); a
        # prober pairs with every stored id below its own — one grouped
        # aggregate + in-row pair expansion, single shuffle
        grouped = banded.groupBy("t", "bucket").agg(
            F.sort_array(F.collect_list(
                F.when(F.col("is_home"), F.col(id_col)))).alias("homes"),
            F.sort_array(F.collect_list(id_col)).alias("probers"),
        )
        return (
            grouped.select(
                "t",
                F.explode(F.expr(
                    f"flatten(transform(array_distinct(probers), x -> "
                    f"transform(filter(slice(homes, 1, {bucket_cap}), "
                    "y -> y < x), y -> struct(y AS id1, x AS id2))))"
                )).alias("p"),
            )
            .select("t", "p.id1", "p.id2")
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "t int, id1 long, id2 long"
    state_schema = "ids array<long>"
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def match(key, pdfs, state: GroupState):
        if ttl_ms and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["t", "id1", "id2"])
            return
        t = int(key[0])
        ids = list(state.get[0]) if state.exists else []
        rows = []
        arrivals = sorted(
            (int(i), bool(h))
            for pdf in pdfs for i, h in zip(pdf[id_col], pdf["is_home"])
        )
        for nid, is_home in arrivals:
            rows.extend((t, pid, nid) for pid in ids[:bucket_cap]
                        if pid != nid)
            if is_home and len(ids) < bucket_cap:
                ids.append(nid)
        state.update((ids,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(rows, columns=["t", "id1", "id2"])

    return banded.groupBy("t", "bucket").applyInPandasWithState(
        match, out_schema, state_schema, "append", timeout_conf
    )


def stream_session_stats(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Session-window aggregate (F.session_window) — per-burst stats."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.col(key_col), F.session_window(ts_col, gap).alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            F.avg(value_col).alias("mean_value"),
        )
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "mean_value",
        )
    )
