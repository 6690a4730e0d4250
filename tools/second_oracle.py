#!/usr/bin/env python3
"""Second INDEPENDENT oracle (r10 VERDICT #8): recompute a handful of
decimal-heavy queries in pure Python (pandas + decimal/int arithmetic,
no SQL engine) and compare bit-exactly against the Spark Verify dump.

The driver's gate compares Spark vs DuckDB; both engines could in
principle agree on a wrong rounding. This replays the arithmetic
contract from first principles:

  exactMean(c)  = float(sum(Decimal(repr(v)).quantize(1e-10, HALF_UP)))
                  / count(non-null v)      -- Spark: sum(cast(c as
                  DECIMAL(28,10))).cast(double) / count(c); the repr()
                  round-trip IS Spark's Double.toString conversion.
  a15           = exact decimal(18,2)x(10,0) product sums, double out.
  a19           = BIGINT KS numerator: max |n2*C1 - n1*C2| over the
                  pooled value order -- pure int arithmetic.

Usage: python3 tools/second_oracle.py <verify_out_dir> <sf_dir> [out_json]
"""
import json
import sys
from decimal import Decimal, ROUND_HALF_UP, getcontext

import pandas as pd

getcontext().prec = 60
Q10 = Decimal(1).scaleb(-10)


def dec10(v) -> Decimal:
    return Decimal(repr(float(v))).quantize(Q10, rounding=ROUND_HALF_UP)


def exact_mean(values) -> float:
    vals = [v for v in values if pd.notna(v)]
    if not vals:
        return None
    return float(sum(dec10(v) for v in vals)) / len(vals)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def a3_mean(sf):
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_discount"])
    return pd.DataFrame({"avg_l_discount": [exact_mean(li["l_discount"])]})


def a4_group_mean(sf):
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_returnflag", "l_quantity"])
    li = li[li["l_returnflag"].notna()]
    rows = [(g, exact_mean(s)) for g, s in li.groupby("l_returnflag")["l_quantity"]]
    return pd.DataFrame(rows, columns=["l_returnflag", "avg_l_quantity"])


def a13_typed_mean(sf):
    # ExactCentsMean: sum of round(v*100) cents as int, / (100*count).
    # math.floor(x+0.5) == Java Math.round == half-up (prices positive).
    import math
    o = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_totalprice"])
    vals = [v for v in o["o_totalprice"] if pd.notna(v)]
    cents = sum(int(math.floor(float(v) * 100.0 + 0.5)) for v in vals)
    return pd.DataFrame({"mean_price": [float(cents) / (100.0 * len(vals))]})


def a15_weighted_avg(sf):
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    rows = []
    for g, grp in li.groupby("l_returnflag"):
        num = Decimal(0)
        den = Decimal(0)
        for p, q in zip(grp["l_extendedprice"], grp["l_quantity"]):
            if pd.isna(p) or pd.isna(q):
                continue
            dp = Decimal(repr(float(p))).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
            dq = Decimal(repr(float(q))).quantize(Decimal(1), rounding=ROUND_HALF_UP)
            num += dp * dq
        for q in grp["l_quantity"]:
            if pd.notna(q):
                den += Decimal(repr(float(q))).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        rows.append((g, float(num) / float(den)))
    return pd.DataFrame(rows, columns=["l_returnflag", "wavg_price"])


def w1_window_agg(sf):
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["ts", "value"])
    ev = ev[ev["ts"].notna()]
    bucket = pd.to_datetime(ev["ts"]).dt.floor("h")
    rows = []
    for b, grp in ev.groupby(bucket):
        rows.append((b, len(grp), exact_mean(grp["value"])))
    return pd.DataFrame(rows, columns=["bucket", "n", "avg_value"])


def a19_ks_drift(sf):
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "value"])
    a = sorted(ev[(ev.event_type == "click") & ev.value.notna()]["value"])
    b = sorted(ev[(ev.event_type == "purchase") & ev.value.notna()]["value"])
    n1, n2 = len(a), len(b)
    num = 0
    for x in sorted(set(a) | set(b)):
        c1 = sum(1 for v in a if v <= x)
        c2 = sum(1 for v in b if v <= x)
        num = max(num, abs(n2 * c1 - n1 * c2))
    return pd.DataFrame({
        "n1": [n1], "n2": [n2], "ks_num": [num],
        "ks_stat": [float(num) / (float(n1) * float(n2))]})


def w5_funnel(sf):
    # full independent replay of the ordered-stage funnel state machine
    # in exact epoch micros (pure integer arithmetic)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "event_type", "ts"])
    ev = ev[ev["event_type"].isin(["view", "click", "purchase"])]
    # normalize to epoch MICROS whatever unit the parquet generation
    # stored (TIMESTAMP(NANOS) loads as datetime64[ns], the current
    # TIMESTAMP(MICROS) as datetime64[us] -- a fixed //1000 would be
    # wrong for one of them)
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    rows = []
    for uid, grp in ev.assign(us=us).groupby("user_id"):
        views = sorted(grp[grp.event_type == "view"]["us"])
        if not views:
            continue
        t1 = views[0]
        clicks = sorted(v for v in grp[grp.event_type == "click"]["us"] if v > t1)
        t2 = clicks[0] if clicks else None
        t3 = None
        if t2 is not None:
            purch = sorted(v for v in grp[grp.event_type == "purchase"]["us"] if v > t2)
            t3 = purch[0] if purch else None
        stage = 1 + (1 if t2 is not None else 0) + (1 if t3 is not None else 0)
        rows.append((uid, t1, t2, t3, stage))
    df = pd.DataFrame(rows, columns=["user_id", "t1_us", "t2_us", "t3_us", "stage"])
    return df


def a20_benford(sf):
    # leading-digit counts (integers) + per-row IEEE chi terms
    P = [0.30102999566398120, 0.17609125905568124, 0.12493873660829993,
         0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
         0.05799194697768673, 0.05115252244738129, 0.04575749056067514]
    import math
    o = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_totalprice"])
    vals = [v for v in o["o_totalprice"] if pd.notna(v) and v >= 1.0]
    digits = [int(str(int(math.floor(v)))[0]) for v in vals]
    n_total = len(digits)
    rows = []
    for d in sorted(set(digits)):
        n_obs = digits.count(d)
        p = P[d - 1] if 1 <= d <= 9 else 0.0
        exp = n_total * p
        rows.append((d, n_obs, exp, (n_obs - exp) * (n_obs - exp) / exp))
    return pd.DataFrame(rows, columns=["digit", "n_obs", "expected", "chi_term"])


def e5_vocab_coverage(sf):
    # pure int counting + one exact-rounded IEEE division per cutoff
    import re
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    freq = {}
    for t in d["text"]:
        for w in re.split(r"\s+", str(t).strip()):
            freq[w] = freq.get(w, 0) + 1
    tot = sum(freq.values())
    rows = []
    for c in [1, 2, 3, 5, 10, 20, 50]:
        n_types = sum(1 for n in freq.values() if n >= c)
        n_occ = sum(n for n in freq.values() if n >= c)
        rows.append((c, n_types, n_occ, float(n_occ) / float(tot)))
    return pd.DataFrame(
        rows, columns=["min_freq", "n_types", "n_occ", "occ_coverage"])


def e7_epoch_shuffle(sf):
    # md5 draw + (draw, id) rank per epoch -- pure hashlib + sort
    import hashlib
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    rows = []
    for epoch in (0, 1):
        drawn = sorted(
            (int(hashlib.md5(f"epoch{epoch}_{i}".encode()).hexdigest()[:8], 16), i)
            for i in d["doc_id"])
        rows.extend(
            (epoch, pos + 1, i) for pos, (_, i) in enumerate(drawn))
    return pd.DataFrame(rows, columns=["epoch", "position", "doc_id"])


def s16_stats_collect(sf):
    # per-column counters in pure int/str arithmetic
    import math
    o = pd.read_parquet(f"{sf}/orders.parquet")
    reprs = {
        "o_orderkey": [int(v) for v in o["o_orderkey"] if pd.notna(v)],
        "o_custkey": [int(v) for v in o["o_custkey"] if pd.notna(v)],
        "o_orderstatus": [s for s in o["o_orderstatus"] if pd.notna(s)],
        "o_totalprice": [int(math.floor(float(v) * 100))
                         for v in o["o_totalprice"] if pd.notna(v)],
        "o_orderdate": [int(v) for v in
                        o["o_orderdate"][o["o_orderdate"].notna()]
                        .astype("datetime64[us]").astype("int64")],
        "o_orderpriority": [s for s in o["o_orderpriority"] if pd.notna(s)],
    }
    n_rows = len(o)
    rows = [
        (name, n_rows, n_rows - len(vals), len(set(vals)),
         str(min(vals)), str(max(vals)))
        for name, vals in reprs.items()]
    return pd.DataFrame(rows, columns=[
        "col_name", "n_rows", "n_nulls", "ndv", "min_repr", "max_repr"])


def _dot(a, b):
    # the engine's FloatDotProduct: sequential index-order fold of
    # float32->double products -- IEEE-reproducible in pure Python
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def e3_kcenter(sf, k=6):
    # Gonzalez farthest-point-first replay: same seed (lowest id),
    # same 1 - dot/(sqrt*sqrt) distance expression, same running-min
    # fold, same (dist desc, id asc) argmax -- no SQL engine involved
    import math
    e = pd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    e = e[e["embedding"].notna()].sort_values("vec_id")
    ids = [int(v) for v in e["vec_id"]]
    emb = {int(v): list(a) for v, a in zip(e["vec_id"], e["embedding"])}
    n2 = {i: _dot(emb[i], emb[i]) for i in ids}
    seed = min(ids)
    selected = [(1, seed, 0.0)]
    chosen = {seed}
    md = {}
    for order in range(2, k + 1):
        c = selected[-1][1]
        cn2 = n2[c]
        for i in ids:
            d = 1.0 - _dot(emb[i], emb[c]) / (math.sqrt(n2[i]) * math.sqrt(cn2))
            md[i] = d if i not in md else min(md[i], d)
        cand = [(md[i], i) for i in ids if i not in chosen]
        best = max(cand, key=lambda t: (t[0], -t[1]))
        selected.append((order, best[1], best[0]))
        chosen.add(best[1])
    return pd.DataFrame(
        selected, columns=["sel_order", "vec_id", "dist_at_selection"])


def _mutual_knn_edges(sf, n_bits=6, k=3):
    # sign-bit bucketed directed top-k, then reciprocal-pair edges
    import math
    e = pd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    e = e[e["embedding"].notna()]
    emb = {int(v): list(a) for v, a in zip(e["vec_id"], e["embedding"])}
    n2 = {i: _dot(v, v) for i, v in emb.items()}
    buckets = {}
    for i, v in emb.items():
        key = "".join("1" if float(v[j]) >= 0 else "0" for j in range(n_bits))
        buckets.setdefault(key, []).append(i)
    directed = {}
    for members in buckets.values():
        for q in members:
            scored = [
                (_dot(emb[q], emb[c]) / (math.sqrt(n2[q]) * math.sqrt(n2[c])), c)
                for c in members if c != q]
            scored.sort(key=lambda t: (-t[0], t[1]))
            for cos, c in scored[:k]:
                directed[(q, c)] = cos
    edges = {}
    for (q, c), cos in directed.items():
        key = (min(q, c), max(q, c))
        n, mx = edges.get(key, (0, None))
        edges[key] = (n + 1, cos if mx is None else max(mx, cos))
    return (sorted(emb), {k_: mx for k_, (n, mx) in edges.items() if n == 2})


def e2_knn_communities(sf, iters=3):
    # weighted synchronous label propagation with DECIMAL(28,10)
    # edge-weight sums (order-free argmax), replayed edge by edge
    ids, edges = _mutual_knn_edges(sf)
    und = []
    for (a, b), cos in edges.items():
        w = dec10(cos)
        und.append((a, b, w))
        und.append((b, a, w))
    label = {i: i for i in ids}
    for _ in range(iters):
        ws = {}
        for src, dst, w in und:
            key = (src, label[dst])
            ws[key] = ws.get(key, Decimal(0)) + w
        best = {}
        for (src, lab), s in ws.items():
            cur = best.get(src)
            if cur is None or (s, -lab) > (cur[0], -cur[1]):
                best[src] = (s, lab)
        label = {i: (best[i][1] if i in best else i) for i in ids}
    sizes = {}
    for lab in label.values():
        sizes[lab] = sizes.get(lab, 0) + 1
    return pd.DataFrame(
        [(i, label[i], sizes[label[i]]) for i in ids],
        columns=["vec_id", "community", "community_size"])


def e5_backoff_score(sf):
    # trigram stupid backoff (Brants 2007): integer count tables from
    # the train slice, the identical CASE chain of IEEE divisions and
    # 0.4 multiplications, and DECIMAL(28,10)-summed per-doc means
    import re
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    toks = {int(i): re.split(r"\s+", str(t).strip())
            for i, t in zip(d["doc_id"], d["text"])}
    c1, c2, c3, t_total = {}, {}, {}, 0
    for i, tk in toks.items():
        if i % 10 == 0:
            continue  # held out
        t_total += len(tk)
        for w in tk:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(tk, tk[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
        for a, b, c in zip(tk, tk[1:], tk[2:]):
            c3[(a, b, c)] = c3.get((a, b, c), 0) + 1
    rows = []
    for i, tk in toks.items():
        if i % 10 != 0:
            continue
        n_occ = {}
        for g in zip(tk, tk[1:], tk[2:]):
            n_occ[g] = n_occ.get(g, 0) + 1
        if not n_occ:
            continue
        n_tri = 0
        sdec = Decimal(0)
        for (w1, w2, w3), n in n_occ.items():
            if c3.get((w1, w2, w3), 0) > 0:
                s = float(c3[(w1, w2, w3)]) / float(c2[(w1, w2)])
            elif c2.get((w2, w3), 0) > 0:
                s = 0.4 * (float(c2[(w2, w3)]) / float(c1[w2]))
            else:
                s = 0.4 * (0.4 * (float(c1.get(w3, 0)) / float(t_total)))
            n_tri += n
            sdec += dec10(float(n) * s)
        rows.append((i, n_tri, float(sdec) / float(n_tri)))
    return pd.DataFrame(rows, columns=["doc_id", "n_trigrams", "mean_s"])


def _backoff_means(toks, train_ids):
    # held-out per-doc stupid-backoff means for a given train slice
    c1, c2, c3, t_total = {}, {}, {}, 0
    for i in train_ids:
        tk = toks[i]
        t_total += len(tk)
        for w in tk:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(tk, tk[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
        for a, b, c in zip(tk, tk[1:], tk[2:]):
            c3[(a, b, c)] = c3.get((a, b, c), 0) + 1
    out = {}
    for i, tk in toks.items():
        if i % 10 != 0:
            continue
        n_occ = {}
        for g in zip(tk, tk[1:], tk[2:]):
            n_occ[g] = n_occ.get(g, 0) + 1
        if not n_occ:
            continue
        n_tri, sdec = 0, Decimal(0)
        for (w1, w2, w3), n in n_occ.items():
            if c3.get((w1, w2, w3), 0) > 0:
                s = float(c3[(w1, w2, w3)]) / float(c2[(w1, w2)])
            elif c2.get((w2, w3), 0) > 0:
                s = 0.4 * (float(c2[(w2, w3)]) / float(c1[w2]))
            else:
                s = 0.4 * (0.4 * (float(c1.get(w3, 0)) / float(t_total)))
            n_tri += n
            sdec += dec10(float(n) * s)
        out[i] = (n_tri, float(sdec) / float(n_tri))
    return out


def e4_blob_meta(sf):
    # blob metadata over the UTF-8 payloads: byte length, md5 digest,
    # md5-derived fake feature
    import hashlib
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        t = str(t)
        dg = hashlib.md5(t.encode("utf-8")).hexdigest()
        rows.append((int(i), len(t.encode("utf-8")), dg,
                     (_md5i(f"{dg}_0") % 1000) / 1000.0))
    return pd.DataFrame(rows, columns=["doc_id", "n_bytes", "digest", "feat0"])


def e4_dim_stats(sf):
    # per-dimension embedding stats with the exact DECIMAL mean over
    # float-widened doubles
    e = pd.read_parquet(f"{sf}/embeddings.parquet", columns=["embedding"])
    dims = len(e["embedding"].iloc[0])
    cols = [[] for _ in range(dims)]
    for v in e["embedding"]:
        for d0 in range(dims):
            cols[d0].append(float(v[d0]))
    rows = [(d0 + 1, len(cols[d0]), exact_mean(cols[d0]),
             min(cols[d0]), max(cols[d0])) for d0 in range(dims)]
    return pd.DataFrame(
        rows, columns=["dim", "n", "mean_v", "min_v", "max_v"])


def e4_decode_stats(sf):
    # the synthetic-PNG decode chain, replayed from the pixel FORMULA
    # (the engine encodes + REALLY decodes; any codec corruption
    # diverges): p_i = ((seed * (((i+1)*MixA + MixB) % P)) % P) % 256
    import hashlib
    P, MixA, MixB = 1000000007, 2654435761, 1013904223
    n = 64
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        dg = hashlib.md5(str(t).encode("utf-8")).hexdigest()
        seed = _md5i(dg)
        px = [((seed * (((k + 1) * MixA + MixB) % P)) % P) % 256
              for k in range(n)]
        s = sum(px)
        rows.append((int(i), 8, 8, s, min(px), max(px), s / 64.0))
    return pd.DataFrame(
        rows, columns=["doc_id", "img_w", "img_h", "px_sum", "px_min",
                       "px_max", "px_mean"])


def e6_data_card(sf):
    # per-source corpus data card: docs/tokens/chars, language count,
    # exact-dup fraction via fingerprints, exact DECIMAL quality mean
    import hashlib
    import re
    stops = {"the", "a", "of", "and", "is", "to"}
    d = pd.read_parquet(
        f"{sf}/documents.parquet",
        columns=["source", "lang", "n_chars", "text"])
    rows = []
    for src, g in d.groupby("source"):
        fps, langs, ntok, qs = set(), set(), 0, []
        nch = 0
        for lg, nc, t in zip(g["lang"], g["n_chars"], g["text"]):
            t = str(t)
            tk = re.split(r"\s+", t.strip())
            ntok += len(tk)
            nch += int(nc)
            langs.add(lg)
            fps.add(hashlib.md5(t.strip().lower().encode("utf-8")).hexdigest())
            qs.append((sum(1 for x in tk if x in stops) / float(len(tk))) * 0.5
                      + min(len(tk) / 100.0, 1.0) * 0.5)
        rows.append((src, int(len(g)), ntok, nch, len(langs),
                     1.0 - len(fps) / float(len(g)), exact_mean(qs)))
    return pd.DataFrame(
        rows, columns=["source", "n_docs", "n_tokens", "n_chars",
                       "n_langs", "dup_frac", "mean_quality"])


_IMG_P, _IMG_A, _IMG_B = 1000000007, 2654435761, 1013904223


def _img_px(seed, i):
    return ((seed * (((i + 1) * _IMG_A + _IMG_B) % _IMG_P)) % _IMG_P) % 256


def _doc_seeds(sf):
    import hashlib
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return [(int(i),
             _md5i(hashlib.md5(str(t).encode("utf-8")).hexdigest()))
            for i, t in zip(d["doc_id"], d["text"])]


def e4_resize_stats(sf):
    # nearest-neighbor 8x8 -> 4x4 resample replayed by source-index
    # arithmetic over the pixel formula
    rows = []
    for i, seed in _doc_seeds(sf):
        px = [_img_px(seed, ((k // 4) * 2) * 8 + (k % 4) * 2)
              for k in range(16)]
        s = sum(px)
        rows.append((i, 4, 4, s, min(px), max(px), s / 16.0))
    return pd.DataFrame(
        rows, columns=["doc_id", "img_w", "img_h", "px_sum", "px_min",
                       "px_max", "px_mean"])


def e4_image_dedup(sf):
    # perceptual average-hash dedup: 16x16 asset per doc_id//5 group,
    # 8x8 gather, integer-mean threshold, 64-bit two's-complement hash
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    from collections import defaultdict
    groups = defaultdict(list)
    for i in d["doc_id"]:
        i = int(i)
        seed = i // 5
        p = [_img_px(seed, ((j // 8) * 2) * 16 + (j % 8) * 2)
             for j in range(64)]
        mean = sum(p) // 64
        h = sum(1 << j for j in range(64) if p[j] > mean)
        if h >= 1 << 63:
            h -= 1 << 64
        groups[h].append(i)
    rows = [(h, len(ms), min(ms)) for h, ms in sorted(groups.items())]
    return pd.DataFrame(rows, columns=["ahash", "n_copies", "keep_doc"])


def e4_scene_cuts(sf):
    # GIF shot-boundary detection: per-frame pixel formula (seed+f),
    # cut when the BIGINT abs-diff sum exceeds 4096
    n = 8 * 6
    rows = []
    for i, seed in _doc_seeds(sf):
        frames = [[_img_px(seed + f, k) for k in range(n)]
                  for f in range(5)]
        cuts = [f for f in range(1, 5)
                if sum(abs(frames[f][k] - frames[f - 1][k])
                       for k in range(n)) > 4096]
        rows.append((i, len(cuts), ",".join(str(f) for f in cuts)))
    return pd.DataFrame(rows, columns=["doc_id", "n_cuts", "cut_frames"])


def e4_audio_stats(sf):
    # PCM WAV parse replayed from the sample formula: 16-bit signed
    # samples, amplitude sum and peak
    rows = []
    for i, seed in _doc_seeds(sf):
        sm = [((seed * (((k + 1) * _IMG_A + _IMG_B) % _IMG_P)) % _IMG_P)
              % 65536 - 32768 for k in range(64)]
        rows.append((i, 64, 8000, sum(sm), max(abs(x) for x in sm)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_samples", "sample_rate", "amp_sum",
                       "amp_peak"])


def e4_video_frames(sf):
    # frame-sampling the animated GIF: middle frame's pixel stats
    n = 8 * 6
    rows = []
    for i, seed in _doc_seeds(sf):
        px = [_img_px(seed + 2, k) for k in range(n)]
        rows.append((i, 5, 2, sum(px), min(px), max(px)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_frames", "frame_idx", "px_sum",
                       "px_min", "px_max"])


def e4_embedding_stats(sf):
    # per-vector norms and fold means with the engine's left fold
    import math
    e = pd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding", "label"])
    rows = []
    for v, a, lb in zip(e["vec_id"], e["embedding"], e["label"]):
        vals = [float(x) for x in a]
        rows.append((int(v), len(vals), math.sqrt(_dot(vals, vals)),
                     _dot(vals, [1.0] * len(vals)) / float(len(vals)),
                     int(lb)))
    return pd.DataFrame(
        rows, columns=["vec_id", "dims", "l2_norm", "avg_val", "label"])


def e2_pagerank_rep(sf):
    # per-cluster PageRank representative: CC labels + the pagerank
    # replay, top-1 per component by (pr desc, id asc)
    ids, pairs = _minhash_band_pairs(sf)
    comp = _cc_components(ids, pairs)
    pr = {int(r.doc_id): float(r.pr) for r in e2_pagerank(sf).itertuples()}
    from collections import Counter
    sizes = Counter(comp.values())
    best = {}
    for i in sorted(ids):
        c = comp[i]
        if c not in best or pr[i] > pr[best[c]]:
            best[c] = i
    rows = [(c, r, pr[r], sizes[c]) for c, r in sorted(best.items())]
    return pd.DataFrame(
        rows, columns=["component", "rep_doc_id", "rep_pr", "cluster_size"])


def e2_lsh_scurve(sf):
    # LSH S-curve calibration: exact Jaccard over all shingle-sharing
    # pairs, bucketed at width 0.1, recall = band-candidate fraction
    import math
    sh = {i: s for i, s in _shingle_sets(sf).items() if s}
    inv = {}
    for i, s in sh.items():
        for h in s:
            inv.setdefault(h, []).append(i)
    pairs = set()
    for members in inv.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                pairs.add((ms[x], ms[y]))
    _, cand = _minhash_band_pairs(sf)
    cand = set(cand)
    from collections import Counter
    n_pairs, n_caught = Counter(), Counter()
    for (a, b) in pairs:
        inter = len(sh[a] & sh[b])
        jac = inter / float(len(sh[a]) + len(sh[b]) - inter)
        bk = min(int(math.floor(jac * 10.0)), 9)
        n_pairs[bk] += 1
        if (a, b) in cand:
            n_caught[bk] += 1
    rows = [(bk, n_pairs[bk], n_caught[bk],
             n_caught[bk] / float(n_pairs[bk]))
            for bk in sorted(n_pairs)]
    return pd.DataFrame(
        rows, columns=["bucket", "n_pairs", "n_caught", "recall"])


def e2_chain_components(sf):
    # consecutive-id chains of qualifying docs (>= 30 tokens):
    # component = min id of the run, everyone else a singleton
    import re
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    qual = {int(i) for i, t in zip(d["doc_id"], d["text"])
            if len(re.split(r"\s+", str(t).strip())) >= 30}
    comp = {}
    for i in sorted(int(x) for x in d["doc_id"]):
        if i in qual and (i - 1) in comp and (i - 1) in qual:
            comp[i] = comp[i - 1]
        else:
            comp[i] = i
    return pd.DataFrame(sorted(comp.items()),
                        columns=["doc_id", "component"])


def e6_ppl_buckets(sf):
    # perplexity tertiles per language: bigram predictability means,
    # ntile(3) over (mean_p desc, doc_id asc)
    lm = e5_lm_score(sf)
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "lang"])
    lang = {int(i): lg for i, lg in zip(d["doc_id"], d["lang"])}
    rows = []
    by_lang = {}
    for r in lm.itertuples():
        by_lang.setdefault(lang[int(r.doc_id)], []).append(
            (int(r.doc_id), float(r.mean_p)))
    for lg in sorted(by_lang):
        ranked = sorted(by_lang[lg], key=lambda t: (-t[1], t[0]))
        n = len(ranked)
        base, extra = divmod(n, 3)
        sizes = [base + (1 if b < extra else 0) for b in range(3)]
        pos = 0
        for b, sz in enumerate(sizes, start=1):
            for i, mp in ranked[pos:pos + sz]:
                rows.append((i, lg, mp, b))
            pos += sz
    return pd.DataFrame(
        rows, columns=["doc_id", "lang", "mean_p", "ppl_bucket"])


def e5_bigram_rarity(sf):
    # rare-bigram fraction: corpus bigram counts, per-doc rare share
    # (corpus count <= 2)
    import re
    from collections import Counter
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    per_doc = {}
    corpus = Counter()
    for i, t in zip(d["doc_id"], d["text"]):
        tk = re.split(r"\s+", str(t).strip())
        c = Counter(f"{a} {b}" for a, b in zip(tk, tk[1:]))
        per_doc[int(i)] = c
        corpus.update(c)
    rows = []
    for i in sorted(per_doc):
        c = per_doc[i]
        if not c:
            continue
        n = sum(c.values())
        nr = sum(v for bg, v in c.items() if corpus[bg] <= 2)
        rows.append((i, n, nr, nr / float(n)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_bigrams", "n_rare", "rare_frac"])


def e5_domain_select(sf):
    # Moore-Lewis selection: in-domain (English train slice) vs
    # general backoff means, ratio where the general score is positive
    import re
    d = pd.read_parquet(f"{sf}/documents.parquet",
                        columns=["doc_id", "lang", "text"])
    toks = {int(i): re.split(r"\s+", str(t).strip())
            for i, t in zip(d["doc_id"], d["text"])}
    lang = {int(i): lg for i, lg in zip(d["doc_id"], d["lang"])}
    train = [i for i in toks if i % 10 != 0]
    s_in = _backoff_means(toks, [i for i in train if lang[i] == "en"])
    s_gen = _backoff_means(toks, train)
    rows = []
    for i in sorted(set(s_in) & set(s_gen)):
        nt, si = s_in[i]
        _, sg = s_gen[i]
        rows.append((i, nt, si, sg, si / sg if sg > 0 else None))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_trigrams", "s_in", "s_gen", "ml_ratio"])


def _f32(x):
    import struct
    return struct.unpack("f", struct.pack("f", x))[0]


def _lloyd(emb, n2, k, iters, tids):
    # Lloyd core (Similarity.kmeans/kmeansCentroids): init = k
    # lowest-id TRAIN vectors; assign by cosine argmax (ties -> lowest
    # cid) with the engine's sequential float32->double dot fold;
    # update = per-dim DECIMAL(28,10) exact mean, rounded back to
    # float32. Returns the final all-vector assignment + centroids.
    import math

    def assign(cents, over):
        out = {}
        for i in over:
            best = None
            for cid in sorted(cents):
                cv, cn2 = cents[cid]
                cos = _dot(emb[i], cv) / (math.sqrt(n2[i]) * math.sqrt(cn2))
                if best is None or (cos, -cid) > (best[1], -best[0]):
                    best = (cid, cos)
            out[i] = best
        return out

    cents = {i: (emb[i], n2[i]) for i in tids if i < k}
    for _ in range(iters):
        a = assign(cents, tids)
        members = {}
        for i, (cid, _) in a.items():
            members.setdefault(cid, []).append(i)
        cents = {}
        for cid, ms in members.items():
            dims = len(emb[ms[0]])
            cv = [_f32(float(sum(dec10(emb[i][d]) for i in ms)) / len(ms))
                  for d in range(dims)]
            cents[cid] = (cv, _dot(cv, cv))
    return assign(cents, sorted(emb)), cents


def _kmeans_chain(sf, k=8, iters=2, train=None):
    emb, n2 = _load_emb(sf)
    tids = [i for i in sorted(emb) if train is None or train(i)]
    a, _ = _lloyd(emb, n2, k, iters, tids)
    return a, emb, n2


def _pq_parts(sf, train=None):
    # per-subspace (16-dim slices) codebooks + codes: k=4, 1 iter
    emb, _ = _load_emb(sf)
    parts = []
    for i in range(4):
        sub = {v: emb[v][i * 16:(i + 1) * 16] for v in emb}
        n2s = {v: _dot(s, s) for v, s in sub.items()}
        tids = [v for v in sorted(sub) if train is None or train(v)]
        a, cents = _lloyd(sub, n2s, 4, 1, tids)
        parts.append((sub, {v: a[v][0] for v in sub}, cents))
    return parts


def e3_pq_codes(sf):
    parts = _pq_parts(sf)
    ids = sorted(parts[0][1])
    rows = [tuple([v] + [parts[i][1][v] for i in range(4)]) for v in ids]
    return pd.DataFrame(
        rows, columns=["vec_id", "code_0", "code_1", "code_2", "code_3"])


def _pq_adc(sf, train=None):
    # asymmetric-distance scoring: fixed left-assoc sum of per-
    # subspace query-centroid dots, top-3 by (adc desc, id asc)
    parts = _pq_parts(sf, train)
    ids = sorted(parts[0][1])
    rows = []
    for q in ids:
        if q >= 32:
            continue
        scored = []
        for c in ids:
            if c == q:
                continue
            adc = 0.0
            first = True
            for i in range(4):
                sub, codes, cents = parts[i]
                p = _dot(sub[q], cents[codes[c]][0])
                adc = p if first else adc + p
                first = False
            scored.append((c, adc))
        top = sorted(scored, key=lambda t: (-t[1], t[0]))[:3]
        for rk, (c, adc) in enumerate(top, start=1):
            rows.append((q, c, adc, rk))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "adc", "rk"])


def e3_pq_adc(sf):
    return _pq_adc(sf)


def e3_pq_incremental(sf):
    return _pq_adc(sf, train=lambda v: v % 7 != 3)


def _cell_probe(cells, emb, n2, n_queries=32, k=3):
    # same-cell brute probe: per query top-k by (cos desc, id asc)
    import math
    members = {}
    for i, c in cells.items():
        members.setdefault(c, []).append(i)
    rows = []
    for q in sorted(emb):
        if q >= n_queries:
            continue
        scored = sorted(
            ((c, _dot(emb[q], emb[c]) /
              (math.sqrt(n2[q]) * math.sqrt(n2[c])))
             for c in members[cells[q]] if c != q),
            key=lambda t: (-t[1], t[0]))[:k]
        for rk, (c, cs) in enumerate(scored, start=1):
            rows.append((q, c, cs, rk))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim", "rk"])


def _load_emb(sf):
    e = pd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = {int(v): [float(x) for x in a]
           for v, a in zip(e["vec_id"], e["embedding"])}
    return emb, {i: _dot(v, v) for i, v in emb.items()}


def _exact_topk(emb, n2, nq=32, k=3):
    import math
    out = {}
    for q in sorted(emb):
        if q >= nq:
            continue
        out[q] = [c for c, _ in sorted(
            ((c, _dot(emb[q], emb[c]) /
              (math.sqrt(n2[q]) * math.sqrt(n2[c])))
             for c in emb if c != q),
            key=lambda t: (-t[1], t[0]))[:k]]
    return out


def e3_ann_recall(sf):
    # recall of the sign-bucket ANN against the exact top-3
    emb, n2 = _load_emb(sf)
    exact = _exact_topk(emb, n2)
    ann = {}
    for r in e3_ann_bucketed(sf).itertuples():
        ann.setdefault(int(r.query_id), set()).add(int(r.vec_id))
    rows = []
    for q in sorted(exact):
        hits = sum(1 for v in exact[q] if v in ann.get(q, set()))
        rows.append((q, len(exact[q]), hits, hits / float(len(exact[q]))))
    return pd.DataFrame(
        rows, columns=["query_id", "n_exact", "n_hit", "recall"])


def e3_sq8_recall(sf):
    emb, n2 = _load_emb(sf)
    exact = _exact_topk(emb, n2)
    sq8 = {}
    for r in e3_sq8_topk(sf).itertuples():
        sq8.setdefault(int(r.query_id), set()).add(int(r.vec_id))
    rows = []
    for q in sorted(exact):
        hits = sum(1 for v in exact[q] if v in sq8.get(q, set()))
        rows.append((q, len(exact[q]), hits, hits / float(len(exact[q]))))
    return pd.DataFrame(
        rows, columns=["query_id", "n_exact", "n_hit", "recall"])


def _ivf_fixed_cells(emb, n2, n_cent=16):
    import math
    cents = {i: emb[i] for i in emb if i < n_cent}

    def rank_cells(i, np):
        ranked = sorted(
            ((cid, _dot(emb[i], cents[cid]) /
              (math.sqrt(n2[i]) * math.sqrt(n2[cid])))
             for cid in sorted(cents)),
            key=lambda t: (-t[1], t[0]))
        return [cid for cid, _ in ranked[:np]]

    cell = {i: rank_cells(i, 1)[0] for i in emb}
    return cell, rank_cells


def e3_ivf_probe(sf, nprobe=3):
    # multi-probe IVF: each query probes its 3 nearest cells
    import math
    emb, n2 = _load_emb(sf)
    cell, rank_cells = _ivf_fixed_cells(emb, n2)
    members = {}
    for i, c in cell.items():
        members.setdefault(c, []).append(i)
    rows = []
    for q in sorted(emb):
        if q >= 32:
            continue
        cand = [c for cid in rank_cells(q, nprobe)
                for c in members.get(cid, []) if c != q]
        scored = sorted(
            ((c, _dot(emb[q], emb[c]) /
              (math.sqrt(n2[q]) * math.sqrt(n2[c]))) for c in cand),
            key=lambda t: (-t[1], t[0]))[:3]
        for rk, (c, cs) in enumerate(scored, start=1):
            rows.append((q, c, cs, rk))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim", "rk"])


def e3_ivf_recall_probe(sf):
    # aggregate recall of the single- and multi-probe IVF vs exact
    emb, n2 = _load_emb(sf)
    exact = _exact_topk(emb, n2)
    rows = []
    for np_ in (1, 3):
        ann = {}
        for r in e3_ivf_probe(sf, nprobe=np_).itertuples():
            ann.setdefault(int(r.query_id), set()).add(int(r.vec_id))
        n_exact = sum(len(v) for v in exact.values())
        n_hit = sum(1 for q, vs in exact.items()
                    for v in vs if v in ann.get(q, set()))
        rows.append((np_, n_exact, n_hit, n_hit / float(n_exact)))
    return pd.DataFrame(
        rows, columns=["nprobe", "n_exact", "n_hit", "recall"])


def e3_hard_negatives(sf):
    # cross-cluster nearest neighbors: kmeans cells, candidates from
    # a DIFFERENT cluster only, top-3
    import math
    a, emb, n2 = _kmeans_chain(sf)
    cl = {i: c for i, (c, _) in a.items()}
    rows = []
    for q in sorted(emb):
        if q >= 32:
            continue
        scored = sorted(
            ((c, _dot(emb[q], emb[c]) /
              (math.sqrt(n2[q]) * math.sqrt(n2[c])))
             for c in emb if c != q and cl[c] != cl[q]),
            key=lambda t: (-t[1], t[0]))[:3]
        for rk, (c, cs) in enumerate(scored, start=1):
            rows.append((q, c, cs, rk))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim", "rk"])


def e3_hybrid_rrf(sf):
    # dense cosine top-20 for vec 0 + BM25 top-20 on doc 0's most
    # frequent non-stop terms, fused by reciprocal rank
    import math
    import re
    from collections import Counter
    emb, n2 = _load_emb(sf)
    dense = sorted(
        ((c, _dot(emb[0], emb[c]) / (math.sqrt(n2[0]) * math.sqrt(n2[c])))
         for c in emb if c != 0),
        key=lambda t: (-t[1], t[0]))[:20]
    rk_a = {c: rk for rk, (c, _) in enumerate(dense, start=1)}
    stops = {"the", "a", "of", "and", "is", "to"}
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    tf, dl = Counter(), {}
    doc0 = None
    for i, t in zip(d["doc_id"], d["text"]):
        toks = re.split(r"\s+", str(t).strip())
        dl[int(i)] = len(toks)
        if int(i) == 0:
            doc0 = toks
        for w in toks:
            tf[(int(i), w)] += 1
    qtf = Counter(w for w in doc0 if w not in stops)
    qt = [w for w, _ in sorted(qtf.items(), key=lambda t: (-t[1], t[0]))[:5]]
    df = Counter()
    for (_, w) in tf:
        df[w] += 1
    n_docs = len(dl)
    avgdl = exact_mean(list(dl.values()))
    scores, terms = {}, Counter()
    for (i, w), f in tf.items():
        if w not in qt:
            continue
        idf = ((n_docs - df[w]) + 0.5) / (df[w] + 0.5)
        tfn = (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (dl[i] / avgdl)))
        scores.setdefault(i, Decimal(0))
        scores[i] += dec10(idf * tfn)
        terms[i] += 1
    sparse = sorted(((i, float(s)) for i, s in scores.items() if i != 0),
                    key=lambda t: (-t[1], t[0]))[:20]
    rk_b = {i: rk for rk, (i, _) in enumerate(sparse, start=1)}
    fused = []
    for i in set(rk_a) | set(rk_b):
        rrf = (1.0 / (60.0 + float(rk_a[i])) if i in rk_a else 0.0) + \
              (1.0 / (60.0 + float(rk_b[i])) if i in rk_b else 0.0)
        fused.append((i, rk_a.get(i), rk_b.get(i), rrf))
    top = sorted(fused, key=lambda t: (-t[3], t[0]))[:10]
    rows = [(i, ra, rb, rrf, rk)
            for rk, (i, ra, rb, rrf) in enumerate(top, start=1)]
    return pd.DataFrame(
        rows, columns=["doc_id", "rk_a", "rk_b", "rrf", "rk"])


def e3_kmeans(sf):
    a, _, _ = _kmeans_chain(sf)
    return pd.DataFrame(
        [(i, a[i][0], a[i][1]) for i in sorted(a)],
        columns=["vec_id", "cluster", "cent_cos"])


def e3_ivf_learned(sf):
    a, emb, n2 = _kmeans_chain(sf)
    return _cell_probe({i: c for i, (c, _) in a.items()}, emb, n2)


def e3_ivf_incremental(sf):
    # centroids trained on the vec_id%7!=3 base, final assignment over
    # the full table, then the same cell probe
    a, emb, n2 = _kmeans_chain(sf, train=lambda i: i % 7 != 3)
    return _cell_probe({i: c for i, (c, _) in a.items()}, emb, n2)


def w6_retention(sf):
    # cohort retention: day-floor, per-user min day, distinct
    # (cohort, offset, user), cell counts — pure pandas group algebra
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
    ev = ev[ev["ts"].notna()].copy()
    ev["d"] = ev["ts"].dt.floor("D")
    cohort = ev.groupby("user_id", as_index=False)["d"].min() \
        .rename(columns={"d": "cohort_day"})
    m = ev.merge(cohort, on="user_id")
    m["day_offset"] = ((m["d"] - m["cohort_day"]).dt.days).astype("int64")
    cells = m[["cohort_day", "day_offset", "user_id"]].drop_duplicates()
    out = (cells.groupby(["cohort_day", "day_offset"], as_index=False)
           .size().rename(columns={"size": "n_users"}))
    out["n_users"] = out["n_users"].astype("int64")
    return out.reset_index(drop=True)


def w7_twap(sf):
    # time-weighted average price: per-user lead gaps, exact
    # DECIMAL(28,10) value×weight sums, one double division at the end
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_id", "value"])
    ev = ev[ev["ts"].notna()].sort_values(["user_id", "ts", "event_id"])
    rows = []
    for u, g in ev.groupby("user_id"):
        tu = (g["ts"].astype("datetime64[us]").astype("int64")).tolist()
        vals = g["value"].tolist()
        vw, w_total, seen, any_val = Decimal(0), 0, False, False
        for i in range(len(tu) - 1):
            w_us = tu[i + 1] - tu[i]
            w_total += w_us
            seen = True
            if pd.notna(vals[i]):
                vw += dec10(vals[i]) * w_us
                any_val = True
        if seen:
            rows.append((
                u, float(vw) / float(w_total) if any_val else None, w_total))
    return pd.DataFrame(rows, columns=["user_id", "twap", "w_total"])


def w8_interval_merge(sf):
    # gaps-and-islands union of [ts, ts + value s) spans per user:
    # running max of prior ends decides island starts
    import math
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_id", "value"])
    ev = ev[ev["ts"].notna() & ev["user_id"].notna() & ev["value"].notna()].copy()
    ev["start_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["end_us"] = ev["start_us"] + ev["value"].map(
        lambda v: int(math.floor(v * 1000000.0)))
    ev = ev.sort_values(["user_id", "start_us", "end_us", "event_id"])
    rows = []
    for u, g in ev.groupby("user_id"):
        max_end, iid = None, 0
        cur = None  # (n, start, end)
        for s0, e0 in zip(g["start_us"], g["end_us"]):
            if max_end is None or s0 > max_end:
                if cur is not None:
                    rows.append((u, iid, cur[0], cur[1], cur[2]))
                iid += 1
                cur = [1, s0, e0]
            else:
                cur[0] += 1
                cur[2] = max(cur[2], e0)
            max_end = e0 if max_end is None else max(max_end, e0)
        if cur is not None:
            rows.append((u, iid, cur[0], cur[1], cur[2]))
    return pd.DataFrame(
        rows, columns=["user_id", "interval_id", "n_merged", "start_us", "end_us"])


def w10_ohlc(sf):
    # 6-hour OHLC bars with the deterministic endpoint tie rule
    # (min value at earliest ts, max value at latest ts)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["ts", "value"])
    ev = ev[ev["ts"].notna() & ev["value"].notna()].copy()
    ev["bucket"] = ev["ts"].dt.floor("6h")
    ev["tu"] = ev["ts"].astype("datetime64[us]").astype("int64")
    rows = []
    for b, g in ev.groupby("bucket"):
        mn, mx = g["tu"].min(), g["tu"].max()
        rows.append((
            b,
            g[g["tu"] == mn]["value"].min(),
            g["value"].max(), g["value"].min(),
            g[g["tu"] == mx]["value"].max(),
            int(len(g))))
    return pd.DataFrame(
        rows, columns=["bucket", "open", "high", "low", "close", "n"])


def j5_asof_join(sf):
    # Point-in-time lookup replayed as per-user binary search (a THIRD
    # algorithm beside Spark's union+window / native merge pass and
    # DuckDB's ASOF JOIN): latest click at-or-before each purchase.
    import bisect
    ev = pd.read_parquet(
        f"{sf}/events.parquet",
        columns=["user_id", "ts", "event_id", "value", "event_type"])
    p = ev[ev["event_type"] == "purchase"][
        ["user_id", "ts", "event_id", "value"]]
    c = (ev[ev["event_type"] == "click"]
         .groupby(["user_id", "ts"], as_index=False)["value"].max()
         .sort_values(["user_id", "ts"]))
    clicks = {}
    for u, t, v in zip(c["user_id"], c["ts"], c["value"]):
        clicks.setdefault(u, ([], []))
        clicks[u][0].append(t)
        clicks[u][1].append(v)
    cv = []
    for u, t in zip(p["user_id"], p["ts"]):
        ts_list, vs = clicks.get(u, ([], []))
        k = bisect.bisect_right(ts_list, t) - 1
        cv.append(vs[k] if k >= 0 else None)
    p = p.copy()
    p["click_value"] = pd.to_numeric(pd.Series(cv, index=p.index))
    return p.reset_index(drop=True)


def j5_asof_bounded(sf):
    # Bounded-horizon as-of (the scalable streaming shape): same
    # binary-search lookup, but the carried click only counts within
    # 1800 s of the purchase — staler matches degrade to null.
    import bisect
    ev = pd.read_parquet(
        f"{sf}/events.parquet",
        columns=["user_id", "ts", "event_id", "value", "event_type"])
    p = ev[ev["event_type"] == "purchase"][
        ["user_id", "ts", "event_id", "value"]]
    c = (ev[ev["event_type"] == "click"]
         .groupby(["user_id", "ts"], as_index=False)["value"].max()
         .sort_values(["user_id", "ts"]))
    clicks = {}
    for u, t, v in zip(c["user_id"], c["ts"], c["value"]):
        clicks.setdefault(u, ([], []))
        clicks[u][0].append(t)
        clicks[u][1].append(v)
    horizon = pd.Timedelta(seconds=1800)
    cv = []
    for u, t in zip(p["user_id"], p["ts"]):
        ts_list, vs = clicks.get(u, ([], []))
        k = bisect.bisect_right(ts_list, t) - 1
        cv.append(vs[k] if k >= 0 and t - ts_list[k] <= horizon else None)
    p = p.copy()
    p["click_value"] = pd.to_numeric(pd.Series(cv, index=p.index))
    return p.reset_index(drop=True)


def e8_decontaminated(sf):
    # Shingle-overlap decontamination replayed from first principles:
    # same md5 token hashes and position-weighted 3-window shingles as
    # the MinHash front end, benchmark = distinct shingles of the
    # doc_id%20==0 slice, corpus doc contaminated iff its DISTINCT
    # shingle overlap with the benchmark reaches 5; output is the
    # surviving corpus (anti-join).
    import hashlib
    import re
    P = 1000000007
    mix = [((j + 1) * 999999937 + 17) % P for j in range(3)]

    def md5i(s):
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)

    d = pd.read_parquet(
        f"{sf}/documents.parquet",
        columns=["doc_id", "source", "n_chars", "text"])
    sh = {}
    for i, t in zip(d["doc_id"], d["text"]):
        toks = re.split(r"\s+", str(t).strip())
        th = [md5i(tok) % P for tok in toks]
        sh[int(i)] = {
            sum(th[k + j] * mix[j] % P for j in range(3)) % P
            for k in range(len(th) - 2)
        } if len(th) >= 3 else set()
    bench = set()
    for i in d["doc_id"]:
        if int(i) % 20 == 0:
            bench |= sh[int(i)]
    corpus = d[d["doc_id"] % 20 != 0]
    bad = {int(i) for i in corpus["doc_id"] if len(sh[int(i)] & bench) >= 5}
    return (corpus[~corpus["doc_id"].isin(bad)][["doc_id", "source", "n_chars"]]
            .reset_index(drop=True))


def e5_fingerprint(sf):
    # md5 content fingerprint + 32-bit SimHash bit votes over full
    # 32-bit token hashes
    import hashlib
    import re
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        t = str(t)
        fp = hashlib.md5(t.strip().lower().encode("utf-8")).hexdigest()
        hs = [_md5i(tok) for tok in re.split(r"\s+", t.strip())]
        sim = 0
        for b in range(32):
            vote = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if vote > 0:
                sim |= 1 << b
        rows.append((int(i), fp, sim))
    return pd.DataFrame(rows, columns=["doc_id", "fp", "simhash"])


def e5_repetition(sf):
    # Gopher/C4 repetition signals: duplicate-window fractions over
    # position-weighted token-hash windows + type-token ratio
    import re
    P = 1000000007
    mixes = {n: [((j + 1) * 999999937 + 17) % P for j in range(n)]
             for n in (2, 3)}

    def dup_frac(hs, n):
        mix = mixes[n]
        w = [sum(hs[k + j] * mix[j] % P for j in range(n)) % P
             for k in range(max(len(hs) - n + 1, 0))]
        return 0.0 if not w else 1.0 - len(set(w)) / float(len(w))

    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        hs = [_md5i(tok) % P for tok in re.split(r"\s+", str(t).strip())]
        ttr = len(set(hs)) / float(len(hs)) if hs else None
        rows.append((int(i), dup_frac(hs, 2), dup_frac(hs, 3), ttr))
    return pd.DataFrame(
        rows,
        columns=["doc_id", "dup_bigram_frac", "dup_trigram_frac", "ttr"])


def a24_cusum_drift(sf):
    # closed-form integer-cents CUSUM: z = r*n - T per day, running
    # prefix sum minus running min, drift iff 2*s > T
    od = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    od = od.copy()
    od["day"] = od["o_orderdate"].dt.floor("D")
    # Decimal round-half-even on the double cents (Spark/DuckDB round())
    r = {}
    for day, g in od.groupby("day"):
        r[day] = sum(
            int(Decimal(repr(float(v) * 100))
                .quantize(Decimal(1), rounding=ROUND_HALF_UP))
            for v in g["o_totalprice"])
    days = sorted(r)
    n, T = len(days), sum(r.values())
    rows, cs, mn = [], 0, None
    for d in days:
        cs += r[d] * n - T
        mn = cs if mn is None or cs < mn else mn
        s = cs - mn
        rows.append((d, s, s * 2 > T))
    return pd.DataFrame(rows, columns=["day", "s_cents", "drift"])


def a25_kmv_distinct(sf):
    # KMV sketch: k smallest distinct md5 prefixes of l_partkey,
    # estimator (k-1) * 2^32 / h_k
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_partkey"])
    keys = {int(k) for k in li["l_partkey"].dropna()}
    hs = sorted({_md5i(f"kmv_{k}") for k in keys})
    k = 256
    mins = hs[:k]
    h_k, n_min = mins[-1], len(mins)
    est = float(n_min) if n_min < k else (k - 1) * 4294967296.0 / h_k
    return pd.DataFrame(
        [(k, h_k, est, len(keys))],
        columns=["k", "h_k", "est_ndv", "true_ndv"])


Q2 = Decimal(1).scaleb(-2)


def _dec2(v):
    return Decimal(repr(float(v))).quantize(Q2, rounding=ROUND_HALF_UP)


def _moments(vals_a, vals_b):
    # SUM(DECIMAL(8,2) * DECIMAL(8,2)) -> double, plus the
    # DECIMAL(28,10) plain sums -> double
    sxy = Decimal(0)
    for a, b in zip(vals_a, vals_b):
        sxy += _dec2(a) * _dec2(b)
    return float(sxy)


def _shingle_sets(sf):
    # distinct position-weighted 3-window shingle hashes per doc (the
    # MinHash front end's msd lists)
    import re
    P = 1000000007
    mix = [((j + 1) * 999999937 + 17) % P for j in range(3)]
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    out = {}
    for i, t in zip(d["doc_id"], d["text"]):
        toks = re.split(r"\s+", str(t).strip())
        th = [_md5i(tok) % P for tok in toks]
        out[int(i)] = {
            sum(th[k + j] * mix[j] % P for j in range(3)) % P
            for k in range(len(th) - 2)
        } if len(th) >= 3 else set()
    return out


def e2_ngram_jaccard(sf):
    # exact Jaccard over distinct shingle sets for the band-bucket
    # candidate pairs
    sh = _shingle_sets(sf)
    _, pairs = _minhash_band_pairs(sf)
    rows = []
    for (a, b) in pairs:
        inter = float(len(sh[a] & sh[b]))
        rows.append((a, b, inter / (len(sh[a]) + len(sh[b]) - inter)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def e2_containment(sf):
    # asymmetric containment over ALL pairs sharing >= 1 shingle
    sh = {i: s for i, s in _shingle_sets(sf).items() if s}
    inv = {}
    for i, s in sh.items():
        for h in s:
            inv.setdefault(h, []).append(i)
    from collections import Counter
    common = Counter()
    for members in inv.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                common[(ms[x], ms[y])] += 1
    rows = []
    for (a, b), nc in common.items():
        na, nb = len(sh[a]), len(sh[b])
        ca, cb = nc / float(na), nc / float(nb)
        if max(ca, cb) >= 0.5:
            rows.append((a, b, nc, na, nb, ca, cb))
    return pd.DataFrame(
        rows,
        columns=["doc_a", "doc_b", "n_common", "n_a", "n_b",
                 "cont_a", "cont_b"])


def e3_knn_graph(sf):
    # mutual-kNN graph: sign-bucket candidates, per-query top-3 by
    # (cos desc, id asc), reciprocity reduction to undirected edges
    import math
    from collections import Counter
    e = pd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = {int(v): [float(x) for x in a]
           for v, a in zip(e["vec_id"], e["embedding"])}
    n2 = {i: _dot(v, v) for i, v in emb.items()}
    buckets = {}
    for i, v in emb.items():
        key = "".join("1" if x >= 0 else "0" for x in v[:6]).ljust(6, "0")
        buckets.setdefault(key, []).append(i)
    directed = []
    for members in buckets.values():
        for q in members:
            scored = sorted(
                ((c, _dot(emb[q], emb[c]) /
                  (math.sqrt(n2[q]) * math.sqrt(n2[c])))
                 for c in members if c != q),
                key=lambda t: (-t[1], t[0]))[:3]
            directed.extend((q, c, cs) for c, cs in scored)
    dirs, cos = Counter(), {}
    for q, c, cs in directed:
        key = (min(q, c), max(q, c))
        dirs[key] += 1
        cos[key] = max(cos.get(key, cs), cs)
    rows = [(a, b, cos[(a, b)]) for (a, b), n in sorted(dirs.items())
            if n == 2]
    return pd.DataFrame(rows, columns=["id_a", "id_b", "cos_sim"])


def e3_ivf_topk(sf):
    # single-cell IVF: every vector assigned to its nearest of the 16
    # lowest-id centroids (ties to lower cid), queries probe only
    # their own cell
    import math
    e = pd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = {int(v): [float(x) for x in a]
           for v, a in zip(e["vec_id"], e["embedding"])}
    n2 = {i: _dot(v, v) for i, v in emb.items()}
    cents = {i: emb[i] for i in emb if i < 16}
    cell = {}
    for i, v in emb.items():
        best = None
        for cid in sorted(cents):
            cos = _dot(v, cents[cid]) / (math.sqrt(n2[i]) * math.sqrt(n2[cid]))
            if best is None or (cos, -cid) > (best[1], -best[0]):
                best = (cid, cos)
        cell[i] = best[0]
    members = {}
    for i, c in cell.items():
        members.setdefault(c, []).append(i)
    rows = []
    for q in sorted(emb):
        if q >= 32:
            continue
        scored = sorted(
            ((c, _dot(emb[q], emb[c]) /
              (math.sqrt(n2[q]) * math.sqrt(n2[c])))
             for c in members[cell[q]] if c != q),
            key=lambda t: (-t[1], t[0]))[:3]
        for rk, (c, cs) in enumerate(scored, start=1):
            rows.append((q, c, cs, rk))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim", "rk"])


def e5_chunks(sf):
    # overlapping 50-token chunks every 40 tokens
    import re
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        tk = re.split(r"\s+", str(t).strip())
        idx = 0
        for s0 in range(0, max(len(tk), 1), 40):
            chunk = tk[s0:s0 + 50]
            rows.append((int(i), idx, " ".join(chunk), len(chunk)))
            idx += 1
    return pd.DataFrame(
        rows, columns=["doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens"])


def _tokens_before(sf):
    import re
    d = pd.read_parquet(f"{sf}/documents.parquet",
                        columns=["doc_id", "source", "text"])
    d = d.sort_values(["source", "doc_id"])
    out = []
    prev_src, run = None, 0
    for i, src, t in zip(d["doc_id"], d["source"], d["text"]):
        if src != prev_src:
            prev_src, run = src, 0
        ntok = len(re.split(r"\s+", str(t).strip()))
        out.append((int(i), src, str(t), ntok, run))
        run += ntok
    return out


def e5_pack(sf):
    # greedy sequence packing: running token offsets per source decide
    # (seq_id, offset) against the 2048-token sequence length
    rows = [(i, src, ntok, tb // 2048, tb % 2048)
            for i, src, _, ntok, tb in _tokens_before(sf)]
    return pd.DataFrame(
        rows, columns=["doc_id", "source", "ntok", "seq_id", "offset_in_seq"])


def e5_pack_assemble(sf):
    # physical assembly: member texts joined with <eos> in packing
    # order, pinned by length + md5 fingerprint
    import hashlib
    groups = {}
    for i, src, t, ntok, tb in _tokens_before(sf):
        groups.setdefault((src, tb // 2048), []).append((i, t))
    rows = []
    for (src, sid), ms in sorted(groups.items()):
        seq = " <eos> ".join(t for _, t in sorted(ms))
        rows.append((src, sid, len(ms), len(seq),
                     hashlib.md5(seq.encode("utf-8")).hexdigest()))
    return pd.DataFrame(
        rows, columns=["source", "seq_id", "n_docs", "n_chars", "fp"])


def e5_quality_langid(sf):
    # per-doc quality/langid feature row: stopword ratio, punct ratio,
    # composite quality, marker-vote language guess
    import re
    en = {"the", "a", "of", "and", "is", "to"}
    de = {"der", "die", "das", "und", "ist", "zu"}
    fr = {"le", "la", "les", "et", "est", "de"}
    punct = set(".,!?;:")
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        t = str(t)
        tk = re.split(r"\s+", t.strip())
        ne, nd, nf = (sum(1 for x in tk if x in m) for m in (en, de, fr))
        stop = ne / float(len(tk))
        pr = sum(1 for ch in t if ch in punct) / float(len(t))
        q = stop * 0.5 + min(len(tk) / 100.0, 1.0) * 0.5
        lang = "en" if (ne >= nd and ne >= nf) else ("de" if nd >= nf else "fr")
        rows.append((int(i), len(tk), stop, pr, q, lang))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "stop_ratio", "punct_ratio",
                       "quality", "lang_guess"])


def e5_classifier_confusion(sf):
    m = e5_quality_classifier(sf)
    out = (m.groupby(["label_seed", "label_pred"], as_index=False)
           .size().rename(columns={"size": "n"}))
    out["n"] = out["n"].astype("int64")
    return out


def e5_lid_model(sf):
    # textcat-style trained LID: 200-char-prefix trigram counts,
    # per-language top-300 profiles, integer dot/norm sums, double
    # cosine argmax (ties to first language)
    import math
    from collections import Counter
    d = pd.read_parquet(f"{sf}/documents.parquet",
                        columns=["doc_id", "lang", "text"])
    dt = {}
    lang_of = {}
    for i, lg, t in zip(d["doc_id"], d["lang"], d["text"]):
        p = str(t).lower()[:200]
        c = Counter(p[k:k + 3] for k in range(max(len(p) - 2, 0)))
        dt[int(i)] = c
        lang_of[int(i)] = lg
    prof_counts = {}
    for i, c in dt.items():
        lg = lang_of[i]
        prof_counts.setdefault(lg, Counter()).update(c)
    prof = {}
    for lg, c in prof_counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:300]
        prof[lg] = dict(top)
    pn2 = {lg: sum(v * v for v in p.values()) for lg, p in prof.items()}
    rows = []
    for i in sorted(dt):
        c = dt[i]
        n2d = sum(v * v for v in c.values())
        best = None
        for lg in sorted(prof):
            dp = sum(c[t] * p for t, p in prof[lg].items() if t in c)
            if dp == 0 and not any(t in c for t in prof[lg]):
                continue  # no shared trigram -> no dots row
            cos = float(dp) / (math.sqrt(float(n2d)) * math.sqrt(float(pn2[lg])))
            if best is None or cos > best[1]:
                best = (lg, cos)  # ties keep the earlier (asc) language
        if best is not None:
            rows.append((i, lang_of[i], best[0]))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "lang_pred"])


def e5_lid_confusion(sf):
    m = e5_lid_model(sf)
    out = (m.groupby(["lang", "lang_pred"], as_index=False)
           .size().rename(columns={"size": "n"}))
    out["n"] = out["n"].astype("int64")
    return out


def _bpe_chain(sf, rounds=4):
    # Sennrich BPE replay: word freqs, per-round weighted pair counts
    # (overlaps included), total-order argmax, greedy left-to-right
    # merge over every word's symbol list
    import re
    from collections import Counter
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    words = Counter()
    for t in d["text"]:
        for w in re.split(r"\s+", str(t).strip()):
            if w:
                words[w] += 1
    syms = {w: list(w) for w in words}
    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for w, f in words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (pa, pb), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, pa, pb, cnt))
        for w in syms:
            s = syms[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == pa and s[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def e5_bpe_train(sf):
    merges, _ = _bpe_chain(sf)
    return pd.DataFrame(
        merges, columns=["round", "sym_a", "sym_b", "pair_count"])


def e5_bpe_apply(sf):
    import re
    _, syms = _bpe_chain(sf)
    n_sym = {w: len(s) for w, s in syms.items()}
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        toks = [w for w in re.split(r"\s+", str(t).strip()) if w]
        if toks:
            rows.append((int(i), len(toks), sum(n_sym[w] for w in toks)))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_bpe_sym"])


def _unigram_chain(sf, rounds=2, K=4, V=32):
    # SentencePiece-family hard-EM replay: substring seed counts,
    # alphabet always kept, per-round Viterbi segmentation under the
    # packed integer objective (pieces * 2^41 - sum(cnt), ties to the
    # shortest last piece) + usage recount + alphabet-or-top-V prune
    import re
    from collections import Counter
    BIG = 1 << 41
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    words = Counter()
    for t in d["text"]:
        for w in re.split(r"\s+", str(t).strip()):
            if w:
                words[w] += 1
    cnt0 = Counter()
    for w, f in words.items():
        for k in range(1, K + 1):
            for i in range(len(w) - k + 1):
                cnt0[w[i:i + k]] += f
    alpha = sorted(p for p in cnt0 if len(p) == 1)

    def prune(cnt):
        vm = {p: cnt.get(p, 0) for p in alpha}
        multi = sorted(((p, c) for p, c in cnt.items() if len(p) > 1),
                       key=lambda kv: (-kv[1], kv[0]))[:V]
        vm.update(dict(multi))
        return vm

    def segment(w, vm):
        dp = [None] * (len(w) + 1)
        dp[0] = (0, [])
        for i in range(1, len(w) + 1):
            best = None
            for k in range(1, min(K, i) + 1):
                p = w[i - k:i]
                if p in vm and dp[i - k] is not None:
                    s = dp[i - k][0] + BIG - vm[p]
                    if best is None or s < best[0]:
                        best = (s, dp[i - k][1] + [p])
            dp[i] = best
        return dp[len(w)][1]

    vocab = prune(cnt0)
    for _ in range(rounds):
        cnt = Counter()
        for w, f in words.items():
            for p in segment(w, vocab):
                cnt[p] += f
        vocab = prune(cnt)
    fsegs = {w: segment(w, vocab) for w in words}
    return words, vocab, fsegs


def e5_unigram_train(sf):
    _, vocab, _ = _unigram_chain(sf)
    return pd.DataFrame(sorted(vocab.items()), columns=["piece", "n_uses"])


def e5_unigram_apply(sf):
    import re
    _, _, fsegs = _unigram_chain(sf)
    n_seg = {w: len(s) for w, s in fsegs.items()}
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        toks = [w for w in re.split(r"\s+", str(t).strip()) if w]
        if toks:
            rows.append((int(i), len(toks), sum(n_seg[w] for w in toks)))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_pieces"])


def e5_bpe_tokens(sf):
    import re
    pat = re.compile(r"[a-z0-9]+|[^a-z0-9\s]")
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rows = [(int(i), len(pat.findall(str(t).lower())),
             len(re.split(r"\s+", str(t).strip())))
            for i, t in zip(d["doc_id"], d["text"])]
    return pd.DataFrame(rows, columns=["doc_id", "n_bpe", "n_ws"])


def e8_contamination(sf):
    # the contamination REPORT: corpus docs with >= 5 distinct
    # shingle overlaps against the doc_id%20==0 benchmark
    sh = _shingle_sets(sf)
    bench = set()
    for i, s in sh.items():
        if i % 20 == 0:
            bench |= s
    rows = [(i, len(s & bench)) for i, s in sorted(sh.items())
            if i % 20 != 0 and len(s & bench) >= 5]
    return pd.DataFrame(rows, columns=["doc_id", "n_overlap"])


def e7_stratified(sf):
    # equal-depth stratified sample: md5 draw order per source, top-20
    d = pd.read_parquet(f"{sf}/documents.parquet",
                        columns=["doc_id", "source"])
    rows = []
    for src, g in d.groupby("source"):
        ranked = sorted(
            ((_md5i(f"strat_{int(i)}"), int(i)) for i in g["doc_id"]))[:20]
        for rk, (_, i) in enumerate(ranked, start=1):
            rows.append((i, src, rk))
    return pd.DataFrame(rows, columns=["doc_id", "source", "rk"])


def e7_upsample(sf):
    # fractional upsampling: whole copies + md5-decided extra copy
    rates = {"src0": 2500, "src1": 500}
    d = pd.read_parquet(f"{sf}/documents.parquet",
                        columns=["doc_id", "source"])
    rows = []
    for i, src in zip(d["doc_id"], d["source"]):
        i = int(i)
        rate = rates.get(src, 1000)
        copies = rate // 1000 + (
            1 if _md5i(f"mix_{i}") % 1000 < rate % 1000 else 0)
        for c in range(1, copies + 1):
            rows.append((i, src, c))
    return pd.DataFrame(rows, columns=["doc_id", "source", "copy_idx"])


def e7_cluster_split(sf):
    # leakage-free splits: CC over the near-dup graph, split decided
    # by md5 of the COMPONENT label so no cluster straddles splits
    ids, pairs = _minhash_band_pairs(sf)
    comp = _cc_components(ids, pairs)
    return pd.DataFrame(
        [(i, comp[i], _split_of(comp[i])) for i in ids],
        columns=["doc_id", "component", "split"])


def e7_curriculum(sf):
    # quality quartile phases: stopword/length quality score, linear-
    # interpolated quartile thresholds, per-row phase assignment
    import math
    import re
    stops = {"the", "a", "of", "and", "is", "to"}
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    qual = {}
    for i, t in zip(d["doc_id"], d["text"]):
        tk = re.split(r"\s+", str(t).strip())
        q = (sum(1 for x in tk if x in stops) / float(len(tk))) * 0.5 \
            + min(len(tk) / 100.0, 1.0) * 0.5
        qual[int(i)] = q
    qs = sorted(qual.values())
    n = len(qs)

    t_hi, t_lo = _pct_interp(qs, 0.75), _pct_interp(qs, 0.25)
    rows = [(i, q, 1 if q >= t_hi else (2 if q >= t_lo else 3))
            for i, q in sorted(qual.items())]
    return pd.DataFrame(rows, columns=["doc_id", "quality", "phase"])


def e7_token_budget(sf):
    # per-source token budgeting: permille weights -> integral target
    # tokens -> epoch multipliers
    import re
    rates = {"src0": 100, "src1": 1000, "src2": 500}
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["source", "text"])
    rows = []
    for src, g in d.groupby("source"):
        ntok = sum(len(re.split(r"\s+", str(t).strip())) for t in g["text"])
        w = rates.get(src, 300)
        target = (w * 1000000) // 1000
        rows.append((src, int(len(g)), ntok, w, target,
                     float(target) / float(ntok)))
    return pd.DataFrame(
        rows, columns=["source", "n_docs", "n_tokens", "weight_permille",
                       "target_tokens", "epochs"])


def e5_tfidf(sf):
    # integer tf-idf: score = tf * ((1e6 * N) // df), top-3 per doc
    import re
    from collections import Counter
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    tf = {}
    df = Counter()
    for i, t in zip(d["doc_id"], d["text"]):
        c = Counter(re.split(r"\s+", str(t).strip()))
        tf[int(i)] = c
        df.update(c.keys())
    n_docs = len(d)
    rows = []
    for i in sorted(tf):
        scored = sorted(
            ((w, f, df[w], f * ((1000000 * n_docs) // df[w]))
             for w, f in tf[i].items()),
            key=lambda t: (-t[3], t[0]))[:3]
        for rk, (w, f, dfe, sc) in enumerate(scored, start=1):
            rows.append((i, w, f, dfe, sc, rk))
    return pd.DataFrame(
        rows, columns=["doc_id", "word", "tf", "df", "score", "rk"])


def e5_lm_score(sf):
    # add-one-smoothed bigram predictability: occurrence-weighted
    # DECIMAL(28,10) mean of p(w2|w1) per doc
    import re
    from collections import Counter
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    doc_bi, cb, vocab = {}, Counter(), set()
    for i, t in zip(d["doc_id"], d["text"]):
        toks = re.split(r"\s+", str(t).strip())
        vocab.update(toks)
        bgs = Counter(zip(toks, toks[1:]))
        doc_bi[int(i)] = bgs
        cb.update(bgs)
    cl = Counter()
    for (w1, _), n in cb.items():
        cl[w1] += n
    v = len(vocab)
    rows = []
    for i in sorted(doc_bi):
        bgs = doc_bi[i]
        if not bgs:
            continue
        n_total = sum(bgs.values())
        s = Decimal(0)
        for (w1, w2), n in bgs.items():
            s += dec10(float(n) * ((cb[(w1, w2)] + 1.0) / (cl[w1] + float(v))))
        rows.append((i, n_total, float(s) / float(n_total)))
    return pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "mean_p"])


def e6_corpus_clean(sf):
    # the clean stage alone: gate -> fingerprint dedup -> component
    # representatives, emitting (doc_id, fp, n_tokens, lang_guess)
    import hashlib
    import re
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    en = {"the", "a", "of", "and", "is", "to"}
    de = {"der", "die", "das", "und", "ist", "zu"}
    fr = {"le", "la", "les", "et", "est", "de"}
    gated = {}
    for i, t in zip(d["doc_id"], d["text"]):
        t = str(t)
        toks = re.split(r"\s+", t.strip())
        ne, nd, nf = (sum(1 for x in toks if x in m) for m in (en, de, fr))
        lang = "en" if (ne >= nd and ne >= nf) else ("de" if nd >= nf else "fr")
        if len(toks) >= 5 and lang == "en":
            gated[int(i)] = (
                len(toks), lang,
                hashlib.md5(t.strip().lower().encode("utf-8")).hexdigest())
    by_fp = {}
    for i in sorted(gated):
        by_fp.setdefault(gated[i][2], i)
    exact = set(by_fp.values())
    _, pairs = _minhash_band_pairs(sf)
    comp = _cc_components(exact, pairs)
    rows = [(i, gated[i][2], gated[i][0], gated[i][1])
            for i in sorted(exact) if comp[i] == i]
    return pd.DataFrame(
        rows, columns=["doc_id", "fp", "n_tokens", "lang_guess"])


def e5_html_extract(sf):
    # HTML main-content extraction: synthetic page wrap, then the
    # strip/split/density/decode chain replayed with Python re (the
    # regexes live in the Java/RE2/Python common dialect: no
    # backreferences, no lookarounds)
    import re as _re
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    block = (r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|"
             r"tr|td|th|section|article|main|header|footer|nav|aside|"
             r"blockquote|pre|form|figure|figcaption|body|html|br|hr)\b[^>]*>")

    def wrap(i, t):
        return (
            '<html><head><title>d%d</title>'
            '<style>body{margin:0;font:14px sans}</style>'
            '<script>var page="d"+%d;track(page);</script></head><body>'
            '<nav><a href="/">home</a> <a href="/tags">tags</a> '
            '<a href="/about">about</a> <a href="/feed">feed</a></nav>'
            '<header><img src="/logo.png"/><a href="/login">login</a></header>'
            '<!-- rendered page shell -->'
            '<div id="main"><p>doc &quot;d%d&quot; &amp; its body:</p><p>%s</p></div>'
            '<footer><a href="/c">c</a> <a href="/d">d</a> '
            '<a href="/e">e</a> <a href="/f">f</a></footer></body></html>'
        ) % (i, i, i, t)

    def extract(h):
        h = _re.sub(r"(?is)<(?:script|style)\b[^>]*>.*?</(?:script|style)\s*>", " ", h)
        h = _re.sub(r"(?is)<head\b[^>]*>.*?</head\s*>", " ", h)
        h = _re.sub(r"(?s)<!--.*?-->", " ", h)
        kept = []
        for seg in _re.split(block, h):
            txt = _re.sub(r"<[^>]*>", "", seg)
            if txt.strip(" ") and 2 * len(txt) > len(seg):
                kept.append(txt.strip(" "))
        s = " ".join(kept)
        for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]:
            s = s.replace(ent, ch)
        return _re.sub(r"\s+", " ", s).strip(" ")

    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        h = wrap(int(i), str(t))
        c = extract(h)
        rows.append((int(i), len(h), c, len(c)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_html_chars", "content", "n_content_chars"])


def e5_normalize(sf):
    # NFC canonical composition over the combining-mark fixture
    import unicodedata
    cu = pd.read_parquet(f"{sf}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    acute, umlaut, cedilla = "́", "̈", "̧"
    rows = []
    for k, name in zip(cu["c_custkey"], cu["c_name"]):
        k = int(k)
        if k % 3 == 0:
            s = f"resume{acute} for {name}"
        elif k % 3 == 1:
            s = f"plain ascii memo of {name}"
        else:
            s = f"Zu{umlaut}rich garc{cedilla}on café avec {name}"
        n = unicodedata.normalize("NFC", s)
        rows.append((k, n, len(s), len(n)))
    return pd.DataFrame(
        rows, columns=["c_custkey", "normalized", "n_cp_before", "n_cp_after"])


def _span_windows(sf, span=6):
    import re
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    wins = {}
    for i, t in zip(d["doc_id"], d["text"]):
        toks = re.split(r"\s+", str(t).strip())
        wins[int(i)] = [
            (p + 1, " ".join(toks[p:p + span]))
            for p in range(max(len(toks) - span + 1, 0))]
    return wins


def e1_span_dedup(sf):
    # fixed-6-token window dedup stats: corpus-wide window counts,
    # per-doc duplicated-window fraction
    from collections import Counter
    wins = _span_windows(sf)
    corpus = Counter(w for ws in wins.values() for _, w in ws)
    rows = []
    for i in sorted(wins):
        ws = wins[i]
        if not ws:
            continue
        nd = sum(1 for _, w in ws if corpus[w] > 1)
        rows.append((i, len(ws), nd, nd / float(len(ws))))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_windows", "n_dup", "dup_frac"])


def e1_span_maximal(sf):
    # maximal duplicated spans: consecutive duplicated windows merge
    # into (start, true token length) islands
    from collections import Counter
    wins = _span_windows(sf)
    corpus = Counter(w for ws in wins.values() for _, w in ws)
    rows = []
    for i in sorted(wins):
        dup_pos = [p for p, w in wins[i] if corpus[w] > 1]
        if not dup_pos:
            continue
        start = prev = dup_pos[0]
        for p in dup_pos[1:]:
            if p == prev + 1:
                prev = p
            else:
                rows.append((i, start, prev - start + 6))
                start = prev = p
        rows.append((i, start, prev - start + 6))
    return pd.DataFrame(rows, columns=["doc_id", "span_start", "span_len"])


def e7_reservoir(sf):
    # deterministic per-source reservoir: md5 draw order, top-5
    d = pd.read_parquet(f"{sf}/documents.parquet",
                        columns=["source", "doc_id"])
    rows = []
    for src, g in d.groupby("source"):
        ranked = sorted(
            ((_md5i(f"reservoir_{int(i)}"), int(i)) for i in g["doc_id"]))[:5]
        for rk, (_, i) in enumerate(ranked, start=1):
            rows.append((src, i, rk))
    return pd.DataFrame(rows, columns=["source", "doc_id", "rk"])


def e7_priority_sample(sf, k=7):
    # Duffield-Lund-Thorup priority sampling: q = w/u with u a nonzero
    # md5 uniform in (0, 1] (exact power-of-two scale); per-source
    # top-k by (q desc, doc_id), tau = the (k+1)-th priority, est_w =
    # max(w, tau). The q divide is one IEEE-correctly-rounded float64
    # op after two exact ones, so Python replays it bit-exactly.
    d = pd.read_parquet(f"{sf}/documents.parquet",
                        columns=["source", "doc_id", "n_chars"])
    rows = []
    for src, g in d.groupby("source"):
        ranked = sorted(
            ((-(float(w) / ((_md5i(f"wsamp_{int(i)}") + 1) / 4294967296.0)),
              int(i), int(w))
             for i, w in zip(g["doc_id"], g["n_chars"])))
        tau = -ranked[k][0] if len(ranked) > k else None
        for rk, (negq, i, w) in enumerate(ranked[:k], start=1):
            est = max(float(w), tau) if tau is not None else float(w)
            rows.append((src, i, w, rk, est))
    return pd.DataFrame(
        rows, columns=["source", "doc_id", "n_chars", "rk", "est_w"])


def e1_source_overlap(sf):
    # cross-source shingle overlap: distinct (source, shingle) sets,
    # pairwise intersection counts, Jaccard
    sh = _shingle_sets(sf)
    d = pd.read_parquet(f"{sf}/documents.parquet",
                        columns=["doc_id", "source"])
    by_src = {}
    for i, src in zip(d["doc_id"], d["source"]):
        by_src.setdefault(src, set()).update(sh[int(i)])
    srcs = sorted(by_src)
    rows = []
    for x in range(len(srcs)):
        for y in range(x + 1, len(srcs)):
            a, b = srcs[x], srcs[y]
            nc = len(by_src[a] & by_src[b])
            if nc == 0:
                continue
            na, nb = len(by_src[a]), len(by_src[b])
            rows.append((a, b, nc, na, nb, nc / float(na + nb - nc)))
    return pd.DataFrame(
        rows,
        columns=["src_a", "src_b", "n_common", "n_a", "n_b", "jaccard"])


def e3_sq8_topk(sf, train=None):
    # SQ8 scalar quantization: per-dim min/max grid (learned on the
    # train slice when given) -> clamped int8 codes -> exact BIGINT
    # code dot products -> double cosine top-3
    import math
    e = pd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = {int(v): [float(x) for x in a]
           for v, a in zip(e["vec_id"], e["embedding"])}
    dims = len(next(iter(emb.values())))
    grid = [v for i, v in emb.items() if train is None or train(i)]
    mns = [min(v[d] for v in grid) for d in range(dims)]
    mxs = [max(v[d] for v in grid) for d in range(dims)]

    def codes(v):
        out = []
        for d in range(dims):
            if mxs[d] == mns[d]:
                out.append(0)
            else:
                q = math.floor((v[d] - mns[d]) / (mxs[d] - mns[d]) * 256.0)
                out.append(int(max(min(q, 255.0), 0.0)))
        return out

    cd = {i: codes(v) for i, v in emb.items()}
    n2 = {i: sum(c * c for c in cs) for i, cs in cd.items()}
    rows = []
    for q in sorted(emb):
        if q >= 32:
            continue
        scored = sorted(
            ((c, sum(x * y for x, y in zip(cd[q], cd[c])) /
              (math.sqrt(n2[q]) * math.sqrt(n2[c])))
             for c in emb if c != q),
            key=lambda t: (-t[1], t[0]))[:3]
        for rk, (c, cs) in enumerate(scored, start=1):
            rows.append((q, c, cs, rk))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "q_cos", "rk"])


def s8_upsert(sf):
    # SCD-1 merge: updates (urgent, price*1.1, 'U') and inserts
    # (negated key from high-priority) win precedence over base rows
    od = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderstatus", "o_orderpriority"])
    best = {}
    for k, c, p, st, pr in zip(od["o_orderkey"], od["o_custkey"],
                               od["o_totalprice"], od["o_orderstatus"],
                               od["o_orderpriority"]):
        k, c, p = int(k), int(c), float(p)
        if k not in best:
            best[k] = (c, p, st)
        if pr == "1-URGENT":
            best[k] = (c, p * 1.1, "U")
        elif pr == "2-HIGH":
            best[-k] = (c, p, "N")
    rows = [(k, c, p, st) for k, (c, p, st) in sorted(best.items())]
    return pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice",
                       "o_orderstatus"])


def e3_ann_bucketed(sf):
    # directed sign-bucket top-3 for the first 32 query vectors
    import math
    e = pd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = {int(v): [float(x) for x in a]
           for v, a in zip(e["vec_id"], e["embedding"])}
    n2 = {i: _dot(v, v) for i, v in emb.items()}
    buckets = {}
    for i, v in emb.items():
        key = "".join("1" if x >= 0 else "0" for x in v[:6]).ljust(6, "0")
        buckets.setdefault(key, []).append(i)
    rows = []
    for members in buckets.values():
        for q in members:
            if q >= 32:
                continue
            scored = sorted(
                ((c, _dot(emb[q], emb[c]) /
                  (math.sqrt(n2[q]) * math.sqrt(n2[c])))
                 for c in members if c != q),
                key=lambda t: (-t[1], t[0]))[:3]
            for rk, (c, cs) in enumerate(scored, start=1):
                rows.append((q, c, cs, rk))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim", "rk"])


def e2_incremental(sf):
    # incremental probe: band pairs where at least one side is a
    # delta doc (doc_id % 10 == 0), normalized to doc_a < doc_b
    _, pairs = _minhash_band_pairs(sf)
    rows = [(a, b, est) for (a, b), est in pairs.items()
            if a % 10 == 0 or b % 10 == 0]
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_est"])


def e5_pii_redact(sf):
    # regex PII scrubbing over the deterministic contact fixture:
    # emails first, then phones, with audit counts
    import re
    email = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9-]+\.[a-zA-Z]{2,}")
    phone = re.compile(r"[0-9]{3}-[0-9]{4}")
    cu = pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"])
    rows = []
    for k in cu["c_custkey"]:
        k = int(k)
        if k % 2 == 0:
            contact = f"reach user{k}@example.com re account"
        else:
            contact = f"call 555-{(k * 7) % 10000:04d} re account"
        rows.append((
            k,
            phone.sub("[PHONE]", email.sub("[EMAIL]", contact)),
            len(email.findall(contact)), len(phone.findall(contact))))
    return pd.DataFrame(
        rows, columns=["c_custkey", "redacted", "n_emails", "n_phones"])


def e2_embed_neardup(sf):
    # sign-bucket LSH pairs with cosine >= 0.35, exact fold arithmetic
    import math
    e = pd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = {int(v): [float(x) for x in a]
           for v, a in zip(e["vec_id"], e["embedding"])}
    n2 = {i: _dot(v, v) for i, v in emb.items()}
    buckets = {}
    for i, v in emb.items():
        key = "".join("1" if x >= 0 else "0" for x in v[:6]).ljust(6, "0")
        buckets.setdefault(key, []).append(i)
    rows = []
    for members in buckets.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                a, b = ms[x], ms[y]
                cos = _dot(emb[a], emb[b]) / (
                    math.sqrt(n2[a]) * math.sqrt(n2[b]))
                if cos >= 0.35:
                    rows.append((a, b, cos))
    return pd.DataFrame(rows, columns=["vec_a", "vec_b", "cos_sim"])


def e2_semantic_dedup(sf):
    # SemDeDup: kmeans clusters (the e3_kmeans replay chain), then
    # within each cluster drop any vector with a cosine>=0.35 twin
    # ranked before it (higher cent_cos, ties to lower id)
    import math
    km = e3_kmeans(sf)
    e = pd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = {int(v): [float(x) for x in a]
           for v, a in zip(e["vec_id"], e["embedding"])}
    n2 = {i: _dot(v, v) for i, v in emb.items()}
    rows = []
    info = {int(r.vec_id): (int(r.cluster), float(r.cent_cos))
            for r in km.itertuples()}
    by_cluster = {}
    for i, (c, cc) in info.items():
        by_cluster.setdefault(c, []).append(i)
    for i, (c, cc) in sorted(info.items()):
        removed = False
        for u in by_cluster[c]:
            if u == i:
                continue
            ucc = info[u][1]
            if ucc < cc or (ucc == cc and u < i):
                cos = _dot(emb[u], emb[i]) / (
                    math.sqrt(n2[u]) * math.sqrt(n2[i]))
                if cos >= 0.35:
                    removed = True
                    break
        rows.append((i, c, cc, not removed))
    return pd.DataFrame(rows, columns=["vec_id", "cluster", "cent_cos", "keep"])


def e2_lev_verify(sf):
    # exact Levenshtein DP over the band-candidate pairs
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, start=1):
            cur = [i]
            for j, cb in enumerate(b, start=1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    texts = {int(i): str(t) for i, t in zip(d["doc_id"], d["text"])}
    _, pairs = _minhash_band_pairs(sf)
    rows = []
    for (a, b) in pairs:
        lv = lev(texts[a], texts[b])
        rows.append((a, b, lv,
                     lv / float(max(len(texts[a]), len(texts[b])))))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "lev", "lev_norm"])


def e2_dedup_impact(sf):
    # per-source removal report: CC over est>=0.5 pairs, longest-doc
    # representative kept, everything else dropped
    ids, pairs = _minhash_band_pairs(sf)
    nodes = set()
    for (a, b), est in pairs.items():
        if est >= 0.5:
            nodes.add(a)
            nodes.add(b)
    comp = _cc_components(nodes, pairs)
    d = pd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "source", "n_chars"])
    nch = {int(i): int(n) for i, n in zip(d["doc_id"], d["n_chars"])}
    best = {}
    for i in sorted(nodes):
        c = comp[i]
        if c not in best or nch[i] > nch[best[c]]:
            best[c] = i
    dropped = nodes - set(best.values())
    rows = []
    for src, g in d.groupby("source"):
        dr = [int(i) for i in g["doc_id"] if int(i) in dropped]
        rows.append((src, int(len(g)), len(dr),
                     int(g["n_chars"].sum()), sum(nch[i] for i in dr)))
    return pd.DataFrame(
        rows,
        columns=["source", "n_docs", "n_dropped", "chars_before",
                 "chars_removed"])


def _simhashes(sf):
    import re
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    sims = {}
    for i, t in zip(d["doc_id"], d["text"]):
        hs = [_md5i(tok) for tok in re.split(r"\s+", str(t).strip())]
        sim = 0
        for b in range(32):
            if sum(1 if (h >> b) & 1 else -1 for h in hs) > 0:
                sim |= 1 << b
        sims[int(i)] = sim
    return sims


def e2_simhash_pairs(sf):
    # all pairs within Hamming radius 3 of the 32-bit SimHash — the
    # 4x8-bit chunk-bucket join is recall-complete at radius 3 by
    # pigeonhole, so the truth set IS the radius ball
    sims = _simhashes(sf)
    ids = sorted(sims)
    rows = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            h = bin(sims[a] ^ sims[b]).count("1")
            if h <= 3:
                rows.append((a, b, h))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])


def e2_triangles(sf):
    p = e2_simhash_pairs(sf)
    adj = {}
    edges = list(zip(p["doc_a"], p["doc_b"]))
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(len(adj[a] & adj[b]) for a, b in edges) // 3
    return pd.DataFrame(
        [(len(edges), tri)], columns=["n_edges", "n_triangles"])


def e2_minhash_pairs(sf):
    _, pairs = _minhash_band_pairs(sf)
    return pd.DataFrame(
        [(a, b, est) for (a, b), est in pairs.items()],
        columns=["doc_a", "doc_b", "jaccard_est"])


def e3_filtered_topk(sf, nq=8, k=5):
    # pre-filtered vector search: candidates restricted to lang='en'
    # docs BEFORE scoring; queries unrestricted; same fold arithmetic
    import math
    emb = pd.read_parquet(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "lang"])
    en = set(int(i) for i, l in zip(docs["doc_id"], docs["lang"]) if l == "en")
    vecs = {int(i): [float(x) for x in v]
            for i, v in zip(emb["vec_id"], emb["embedding"])}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    n2 = {i: fold_dot(v, v) for i, v in vecs.items()}
    rows = []
    for q in sorted(vecs):
        if q >= nq:
            continue
        scored = sorted(
            ((c, fold_dot(vecs[q], vecs[c]) /
              (math.sqrt(n2[q]) * math.sqrt(n2[c])))
             for c in vecs if c != q and c in en),
            key=lambda t: (-t[1], t[0]))[:k]
        for rk, (c, cs) in enumerate(scored, start=1):
            rows.append((q, c, cs, rk))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim", "rk"])


def e3_cosine_topk(sf):
    # brute-force cosine top-k replayed with the exact left-fold
    # arithmetic: float32 -> double per element, left-associated adds
    emb = pd.read_parquet(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    vecs = {int(i): [float(x) for x in v]
            for i, v in zip(emb["vec_id"], emb["embedding"])}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    import math
    n2 = {i: fold_dot(v, v) for i, v in vecs.items()}
    rows = []
    for q in sorted(vecs):
        if q >= 8:
            continue
        scored = sorted(
            ((c, fold_dot(vecs[q], vecs[c]) /
              (math.sqrt(n2[q]) * math.sqrt(n2[c])))
             for c in vecs if c != q),
            key=lambda t: (-t[1], t[0]))[:5]
        for rk, (c, cs) in enumerate(scored, start=1):
            rows.append((q, c, cs, rk))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim", "rk"])


def p9_target_encode(sf):
    # leave-one-out target encoding with exact DECIMAL(28,10) group
    # sums: loo = (S_g - v_i) / (n_g - 1)
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "event_type", "value"])
    ev = ev[ev["value"].notna() & ev["event_type"].notna()]
    rows = []
    for g, grp in ev.groupby("event_type"):
        n = len(grp)
        if n <= 1:
            continue
        s_g = sum(dec10(v) for v in grp["value"])
        for i, v in zip(grp["event_id"], grp["value"]):
            rows.append((int(i), g, float(s_g - dec10(v)) / (n - 1)))
    return pd.DataFrame(rows, columns=["event_id", "event_type", "loo_mean"])


def _pipeline_etl(sf):
    # the reference heart-failure ETL chain rebuilt in pandas: analog
    # inputs, coerce-to-null, measure filter, dropna, inner join
    od = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderpriority",
                 "o_totalprice", "o_orderdate"])
    cu = pd.read_parquet(
        f"{sf}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_mktsegment"])
    r = pd.DataFrame({
        "facility_id": [str(int(k)).zfill(6) for k in od["o_custkey"]],
        "measure_name": od["o_orderpriority"].values,
        "number_of_discharges": [
            None if int(k) % 7 == 0 else float(int(k) % 50)
            for k in od["o_orderkey"]],
        "excess_readmission_ratio": [
            None if int(k) % 11 == 0 else float(v)
            for k, v in zip(od["o_orderkey"], od["o_totalprice"])],
        "start_date": od["o_orderdate"].dt.strftime("%Y-%m-%d").values})
    h = pd.DataFrame({
        "facility_id": [str(int(k)).zfill(6) for k in cu["c_custkey"]],
        "facility_name": cu["c_name"].values,
        "city_town": [f"city_{int(n)}" for n in cu["c_nationkey"]],
        "state": [None if int(k) % 13 == 0 else f"S{int(n) % 10}"
                  for k, n in zip(cu["c_custkey"], cu["c_nationkey"])],
        "hospital_type": cu["c_mktsegment"].values,
        "hospital_ownership": [f"own{int(k) % 3}" for k in cu["c_custkey"]]})
    etl = r[(r["measure_name"] == "1-URGENT")
            & r["number_of_discharges"].notna()
            & r["excess_readmission_ratio"].notna()].merge(h, on="facility_id")
    return etl


def pipeline_e2e(sf):
    return _pipeline_etl(sf)[[
        "facility_id", "measure_name", "number_of_discharges",
        "excess_readmission_ratio", "start_date", "facility_name",
        "city_town", "state", "hospital_type", "hospital_ownership"]]


def pipeline_dashboard(sf):
    etl = _pipeline_etl(sf)
    rows = [("n_hospitals", "", float(etl["facility_id"].nunique())),
            ("avg_ratio", "", exact_mean(etl["excess_readmission_ratio"]))]
    st = etl[etl["state"].notna()]
    for s, g in st.groupby("state"):
        rows.append(("by_state", s, exact_mean(g["excess_readmission_ratio"])))
    for o, g in etl.groupby("hospital_ownership"):
        rows.append(("by_ownership", o,
                     exact_mean(g["excess_readmission_ratio"])))
    return pd.DataFrame(rows, columns=["which", "k", "metric"])


def pipeline_topn(sf):
    etl = _pipeline_etl(sf)
    cols = ["facility_id", "facility_name", "state",
            "excess_readmission_ratio"]
    rows = []
    recs = list(etl[cols].itertuples(index=False, name=None))
    hi = sorted(recs, key=lambda t: (-t[3], t[0], t[1]))[:5]
    lo = sorted(recs, key=lambda t: (t[3], t[0], t[1]))[:5]
    for t in hi:
        rows.append(("highest",) + t)
    for t in lo:
        rows.append(("lowest",) + t)
    return pd.DataFrame(rows, columns=["which"] + cols)


def a10_corr(sf):
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"])
    import math
    x, y = li["l_quantity"].tolist(), li["l_extendedprice"].tolist()
    n = float(len(x))
    sx = float(sum(dec10(v) for v in x))
    sy = float(sum(dec10(v) for v in y))
    sxy, sxx, syy = _moments(x, y), _moments(x, x), _moments(y, y)
    corr = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    return pd.DataFrame([(corr,)], columns=["corr_qty_price"])


def a14_group_regression(sf):
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    rows = []
    for g, grp in li.groupby("l_returnflag"):
        x, y = grp["l_quantity"].tolist(), grp["l_extendedprice"].tolist()
        n = float(len(x))
        sx = float(sum(dec10(v) for v in x))
        sy = float(sum(dec10(v) for v in y))
        sxy, sxx = _moments(x, y), _moments(x, x)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        rows.append((g, int(n), slope, intercept))
    return pd.DataFrame(
        rows, columns=["l_returnflag", "n_rows", "slope", "intercept"])


def a26_corr_matrix(sf):
    import math
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=cols)
    vals = {c: li[c].tolist() for c in cols}
    n = float(len(li))
    s = {c: float(sum(dec10(v) for v in vals[c])) for c in cols}
    m = {}
    for i, a in enumerate(cols):
        m[(a, a)] = _moments(vals[a], vals[a])
        for b in cols[i + 1:]:
            m[(a, b)] = _moments(vals[a], vals[b])
    rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            corr = (n * m[(a, b)] - s[a] * s[b]) / (
                math.sqrt(n * m[(a, a)] - s[a] * s[a]) *
                math.sqrt(n * m[(b, b)] - s[b] * s[b]))
            rows.append((a, b, corr))
    return pd.DataFrame(rows, columns=["col_x", "col_y", "corr"])


def e5_bm25(sf):
    # BM25 from first principles: tf/df/dl/avgdl counters, top-5
    # highest-df non-stopword query terms, per-term double scores
    # summed through DECIMAL(28,10)
    import re
    from collections import Counter
    stops = {"the", "a", "of", "and", "is", "to"}
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    tf, dl = Counter(), {}
    for i, t in zip(d["doc_id"], d["text"]):
        toks = re.split(r"\s+", str(t).strip())
        dl[int(i)] = len(toks)
        for w in toks:
            tf[(int(i), w)] += 1
    df = Counter()
    for (_, w) in tf:
        df[w] += 1
    qt = [w for w, _ in sorted(
        ((w, n) for w, n in df.items() if w not in stops),
        key=lambda t: (-t[1], t[0]))[:5]]
    n_docs = len(dl)
    avgdl = exact_mean(list(dl.values()))
    scores, terms = {}, Counter()
    for (i, w), f in tf.items():
        if w not in qt:
            continue
        idf = ((n_docs - df[w]) + 0.5) / (df[w] + 0.5)
        tfn = (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (dl[i] / avgdl)))
        scores.setdefault(i, Decimal(0))
        scores[i] += dec10(idf * tfn)
        terms[i] += 1
    ranked = sorted(((i, terms[i], float(s)) for i, s in scores.items()),
                    key=lambda t: (-t[2], t[0]))[:20]
    return pd.DataFrame(
        [(i, n, s, rk) for rk, (i, n, s) in enumerate(ranked, start=1)],
        columns=["doc_id", "n_terms", "score", "rk"])


def _pct_interp(qs, p):
    # Spark percentile / DuckDB quantile_cont: pos = p*(n-1), then the
    # CONVEX form lo*(1-d) + hi*d (Spark's getPercentile — NOT
    # lo + d*(hi-lo), which differs in IEEE arithmetic)
    import math
    pos = p * (len(qs) - 1)
    k = int(math.floor(pos))
    d = pos - k
    return qs[k] * (1 - d) + qs[k + 1] * d if d > 0 else qs[k]


def a12_cube(sf):
    # CUBE grouping sets with DECIMAL(28,2)-exact price sums
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"])
    rows = []
    for keys in (("l_returnflag", "l_linestatus"), ("l_returnflag",),
                 ("l_linestatus",), ()):
        if keys:
            for k, g in li.groupby(list(keys)):
                k = k if isinstance(k, tuple) else (k,)
                d = dict(zip(keys, k))
                rows.append((d.get("l_returnflag"), d.get("l_linestatus"),
                             len(g),
                             float(sum(_dec2(v) for v in g["l_extendedprice"]))))
        else:
            rows.append((None, None, len(li),
                         float(sum(_dec2(v) for v in li["l_extendedprice"]))))
    return pd.DataFrame(
        rows, columns=["l_returnflag", "l_linestatus", "n", "sum_price"])


def a17_grouping_id(sf):
    # ROLLUP with GROUPING ids
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_returnflag", "l_linestatus"])
    rows = []
    for rf_ls, g in li.groupby(["l_returnflag", "l_linestatus"]):
        rows.append((rf_ls[0], rf_ls[1], len(g), 0, 0))
    for rf, g in li.groupby("l_returnflag"):
        rows.append((rf, None, len(g), 1, 0))
    rows.append((None, None, len(li), 3, 1))
    return pd.DataFrame(
        rows, columns=["l_returnflag", "l_linestatus", "n", "level_id",
                       "flag_is_total"])


def o10_gap_fill(sf):
    # month spine per customer with forward-filled totals
    od = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    od = od.copy()
    od["m"] = [(d.year, d.month) for d in od["o_orderdate"]]
    monthly = {}
    for (u, m), g in od.groupby(["o_custkey", "m"]):
        monthly[(int(u), m)] = float(sum(dec10(v) for v in g["o_totalprice"]))
    bounds = {}
    for (u, m) in monthly:
        lo, hi = bounds.get(u, (m, m))
        bounds[u] = (min(lo, m), max(hi, m))

    def next_month(m):
        y, mo = m
        return (y + 1, 1) if mo == 12 else (y, mo + 1)

    rows = []
    for u in sorted(bounds):
        lo, hi = bounds[u]
        filled, m = None, lo
        while m <= hi:
            mt = monthly.get((u, m))
            if mt is not None:
                filled = mt
            rows.append((u, pd.Timestamp(m[0], m[1], 1), mt, filled))
            m = next_month(m)
    return pd.DataFrame(
        rows, columns=["o_custkey", "m", "m_total", "filled_total"])


def o12_cumulative_users(sf):
    # first-touch attribution: per-user min hour, new users per hour,
    # running total
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
    ev = ev[ev["ts"].notna()].copy()
    ev["h"] = ev["ts"].dt.floor("h")
    first = ev.groupby("user_id")["h"].min()
    from collections import Counter
    daily = Counter(first)
    rows, cum = [], 0
    for d in sorted(daily):
        cum += daily[d]
        rows.append((d, daily[d], cum))
    return pd.DataFrame(rows, columns=["d", "new_users", "cum_users"])


def o14_transitions(sf):
    # first-order Markov transition counts and per-state probabilities
    from collections import Counter
    ev = pd.read_parquet(
        f"{sf}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"])
    ev = ev[ev["ts"].notna()].sort_values(["user_id", "ts", "event_id"])
    pairs = Counter()
    for _, g in ev.groupby("user_id"):
        ets = list(g["event_type"])
        for a, b in zip(ets, ets[1:]):
            pairs[(a, b)] += 1
    from_tot = Counter()
    for (a, _), n in pairs.items():
        from_tot[a] += n
    rows = [(a, b, n, n / float(from_tot[a]))
            for (a, b), n in sorted(pairs.items())]
    return pd.DataFrame(rows, columns=["from_type", "to_type", "n", "p"])


def w2_sessionize(sf):
    # manual gaps-and-islands sessionization (strict > 30 min gap):
    # per-session event counts and durations
    gap = 1800000000
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_id"])
    ev = ev[ev["ts"].notna() & ev["user_id"].notna()].copy()
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.sort_values(["user_id", "us", "event_id"])
    rows = []
    for u, g in ev.groupby("user_id"):
        sid, last = 0, None
        start, n = None, 0
        for us in g["us"]:
            if last is None or us - last > gap:
                if start is not None:
                    rows.append((u, sid, n, last - start))
                sid += 1
                start, n = us, 1
            else:
                n += 1
            last = us
        if start is not None:
            rows.append((u, sid, n, last - start))
    return pd.DataFrame(
        rows, columns=["user_id", "session_id", "n_events", "duration_us"])


def o9_moving_median(sf):
    # 5-row trailing window median per customer
    od = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    od = od.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    rows = []
    for u, g in od.groupby("o_custkey"):
        vals = [float(v) for v in g["o_totalprice"]]
        ks = [int(k) for k in g["o_orderkey"]]
        for j in range(len(vals)):
            w = sorted(vals[max(j - 4, 0):j + 1])
            rows.append((ks[j], int(u), vals[j],
                         _pct_interp(w, 0.5), len(w)))
    return pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice",
                       "med5", "n5"])


def o11_ewma(sf):
    # EWMA over the last 20 values: left fold s*0.5 + v*0.5 from 0.0
    ev = pd.read_parquet(
        f"{sf}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"])
    ev = ev[ev["ts"].notna()].sort_values(["user_id", "ts", "event_id"])
    rows = []
    for u, g in ev.groupby("user_id"):
        vals = list(g["value"])
        eids = [int(x) for x in g["event_id"]]
        for j in range(len(vals)):
            s = 0.0
            for v in vals[max(j - 19, 0):j + 1]:
                s = s * 0.5 + v * 0.5
            rows.append((u, eids[j], vals[j], s))
    return pd.DataFrame(rows, columns=["user_id", "event_id", "value", "ewma"])


def o13_pareto(sf):
    # revenue concentration: DECIMAL(28,4) part revenues, cumulative
    # share over (rev desc, partkey), top 100
    Q4 = Decimal(1).scaleb(-4)
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"])
    rev = {}
    for k, p, dd in zip(li["l_partkey"], li["l_extendedprice"],
                        li["l_discount"]):
        term = Decimal(repr(float(p) * (1.0 - float(dd)))) \
            .quantize(Q4, rounding=ROUND_HALF_UP)
        rev[int(k)] = rev.get(int(k), Decimal(0)) + term
    total = float(sum(rev.values()))
    ranked = sorted(rev.items(), key=lambda t: (-t[1], t[0]))
    rows, cum = [], Decimal(0)
    for rk, (k, r) in enumerate(ranked[:100], start=1):
        cum += r
        rows.append((k, rk, float(cum) / total))
    return pd.DataFrame(rows, columns=["l_partkey", "rk", "cum_share"])


def p7_winsorize(sf):
    # decile clipping with interpolated bounds
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"])
    qs = sorted(float(v) for v in li["l_quantity"])
    lo, hi = _pct_interp(qs, 0.1), _pct_interp(qs, 0.9)
    rows = [(int(k), int(ln), float(v), min(max(float(v), lo), hi))
            for k, ln, v in zip(li["l_orderkey"], li["l_linenumber"],
                                li["l_quantity"])]
    return pd.DataFrame(
        rows, columns=["l_orderkey", "l_linenumber", "l_quantity", "clipped"])


def s14_scd2(sf):
    # SCD2 history: change rows per user under (ts, event_id) order,
    # validity intervals via lead, open rows flagged current
    ev = pd.read_parquet(
        f"{sf}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"])
    ev = ev[ev["user_id"] % 10 == 0].sort_values(
        ["user_id", "ts", "event_id"])
    far = pd.Timestamp("2199-12-31")
    rows = []
    for u, g in ev.groupby("user_id"):
        chg = []
        prev = object()
        for et, ts in zip(g["event_type"], g["ts"]):
            if et != prev:
                chg.append((et, ts))
            prev = et
        for j, (et, ts) in enumerate(chg):
            nxt = chg[j + 1][1] if j + 1 < len(chg) else None
            rows.append((u, et, ts, nxt if nxt is not None else far,
                         nxt is None))
    return pd.DataFrame(
        rows, columns=["user_id", "event_type", "valid_from", "valid_to",
                       "is_current"])


def s20_snapshot_read(sf):
    # time-travel read of the SCD2 history at a fixed instant
    h = s14_scd2(sf)
    at = pd.Timestamp("2024-01-20")
    return h[(h["valid_from"] <= at) & (at < h["valid_to"])] \
        .reset_index(drop=True)


def a18_heavy_hitters(sf):
    # Misra-Gries gate: candidates can never exclude a true heavy
    # hitter, so the exact-count filter IS the truth table
    from collections import Counter
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
    counts = Counter(int(u) for u in ev["user_id"])
    total = len(ev)
    thr = total // 129
    rows = [(u, c) for u, c in sorted(counts.items()) if c > thr]
    return pd.DataFrame(rows, columns=["user_id", "cnt"])


def a16_mode(sf):
    # per-group mode with (count desc, value asc) tiebreak
    from collections import Counter
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_returnflag", "l_quantity"])
    rows = []
    for g, grp in li.groupby("l_returnflag"):
        c = Counter(float(v) for v in grp["l_quantity"])
        v, n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append((g, v, n))
    return pd.DataFrame(rows, columns=["l_returnflag", "mode_quantity", "n_rows"])


def a11_histogram(sf):
    import math
    from collections import Counter
    od = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_totalprice"])
    c = Counter(int(math.floor(v / 25000.0)) for v in od["o_totalprice"])
    return pd.DataFrame(sorted(c.items()), columns=["bucket", "n"])


def a21_chi_drift(sf):
    # bucketed two-sample chi-square with DECIMAL(28,10) term sums
    import math
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "value"])
    ev = ev[ev["event_type"].isin(["click", "purchase"]) & ev["value"].notna()]
    from collections import Counter
    c1, c2 = Counter(), Counter()
    for et, v in zip(ev["event_type"], ev["value"]):
        b = int(math.floor(v / 8.0))
        (c1 if et == "click" else c2)[b] += 1
    buckets = set(c1) | set(c2)
    n1, n2 = sum(c1.values()), sum(c2.values())
    td = Decimal(0)
    for b in buckets:
        d = c1[b] * n2 - c2[b] * n1
        td += dec10(float(d) * float(d) / float(c1[b] + c2[b]))
    chi2 = float(td) / (float(n1) * float(n2))
    return pd.DataFrame(
        [(n1, n2, len(buckets), chi2)],
        columns=["n1", "n2", "n_buckets", "chi2"])


def a22_mad_outliers(sf):
    # median/MAD outlier gate with the deterministic lower-median rule
    # (rank (n+1)//2 under (value, event_id) order)
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "value", "event_id"])
    ev = ev[ev["value"].notna()]
    rows = []
    for g, grp in ev.groupby("event_type"):
        vs = sorted(zip(grp["value"], grp["event_id"]))
        n = len(vs)
        med = vs[(n + 1) // 2 - 1][0]
        dvs = sorted((abs(v - med), i) for v, i in vs)
        mad = dvs[(n + 1) // 2 - 1][0]
        n_out = sum(1 for dv, _ in dvs if dv > 3.0 * mad)
        rows.append((g, n, med, mad, n_out))
    return pd.DataFrame(
        rows, columns=["event_type", "n", "med", "mad", "n_outliers"])


def e5_quality_classifier(sf):
    # centroid quality classifier: per-doc (stopword frac, capped
    # length, TTR) features, seed labels from the 0.5/0.5 rule, class
    # centroids as exact DECIMAL means, nearest-centroid prediction
    # with left-associated double distance sums
    import re
    stops = {"the", "a", "of", "and", "is", "to"}
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    feats = []
    for i, t in zip(d["doc_id"], d["text"]):
        tk = re.split(r"\s+", str(t).strip())
        f_stop = sum(1 for x in tk if x in stops) / float(len(tk))
        f_len = min(len(tk) / 100.0, 1.0)
        f_ttr = len(set(tk)) / float(len(tk))
        seed = "hi" if f_stop * 0.5 + f_len * 0.5 >= 0.5 else "lo"
        feats.append((int(i), f_stop, f_len, f_ttr, seed))
    cents = {}
    for cls in ("hi", "lo"):
        rowsc = [f for f in feats if f[4] == cls]
        cents[cls] = tuple(
            float(sum(dec10(r[j]) for r in rowsc)) / len(rowsc)
            for j in (1, 2, 3))
    out = []
    for i, fs, fl, ft, seed in feats:
        def d2(cls):
            c = cents[cls]
            return ((fs - c[0]) * (fs - c[0]) + (fl - c[1]) * (fl - c[1])) \
                + (ft - c[2]) * (ft - c[2])
        out.append((i, seed, "hi" if d2("hi") <= d2("lo") else "lo"))
    return pd.DataFrame(out, columns=["doc_id", "label_seed", "label_pred"])


def w4_hopping(sf):
    # 1-hour windows hopping every 15 min: each event lands in 4
    # buckets; counts + exact DECIMAL mean per bucket
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["ts", "value"])
    ev = ev[ev["ts"].notna()].copy()
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    hop = 900000000
    groups = {}
    for u, v in zip(us, ev["value"]):
        base = u // hop
        for k in range(4):
            groups.setdefault((base - k) * hop, []).append(v)
    rows = [(pd.to_datetime(b, unit="us"), len(vs), exact_mean(vs))
            for b, vs in sorted(groups.items())]
    return pd.DataFrame(rows, columns=["bucket", "n", "avg_value"])


def a19_drift_stream(sf):
    # 6-hour drift histogram: epoch-aligned buckets, value binned at
    # width 8
    import math
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["ts", "event_type", "value"])
    ev = ev[ev["event_type"].isin(["click", "purchase"])
            & ev["value"].notna() & ev["ts"].notna()].copy()
    ev["win_start"] = ev["ts"].dt.floor("6h")
    ev["bucket"] = [int(math.floor(v / 8.0)) for v in ev["value"]]
    out = (ev.groupby(["win_start", "event_type", "bucket"], as_index=False)
           .size().rename(columns={"size": "n"}))
    out["n"] = out["n"].astype("int64")
    return out


def w3_session_window(sf):
    # 30-minute-gap sessionization as a per-user sequential sweep:
    # session start = first event, end = last event + 30 min
    gap = 1800000000  # us
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_id"])
    ev = ev[ev["ts"].notna() & ev["user_id"].notna()].copy()
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.sort_values(["user_id", "us", "event_id"])
    rows = []
    for u, g in ev.groupby("user_id"):
        start, last, n = None, None, 0
        for us in g["us"]:
            if last is not None and us - last < gap:
                n += 1
            else:
                if start is not None:
                    rows.append((u, start, last + gap, n))
                start, n = us, 1
            last = us
        if start is not None:
            rows.append((u, start, last + gap, n))
    out = pd.DataFrame(
        rows, columns=["user_id", "sess_start", "sess_end", "n_events"])
    out["sess_start"] = pd.to_datetime(out["sess_start"], unit="us")
    out["sess_end"] = pd.to_datetime(out["sess_end"], unit="us")
    return out


def a24_cusum_stream(sf):
    # streaming CUSUM twin over purchase events' daily cents
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["ts", "value", "event_type"])
    ev = ev[(ev["event_type"] == "purchase")
            & ev["value"].notna() & ev["ts"].notna()].copy()
    ev["day"] = ev["ts"].dt.floor("D")
    r = {}
    for day, g in ev.groupby("day"):
        r[day] = sum(
            int(Decimal(repr(float(v) * 100))
                .quantize(Decimal(1), rounding=ROUND_HALF_UP))
            for v in g["value"])
    days = sorted(r)
    n, T = len(days), sum(r.values())
    rows, cs, mn = [], 0, None
    for d in days:
        cs += r[d] * n - T
        mn = cs if mn is None or cs < mn else mn
        s = cs - mn
        rows.append((d, s, s * 2 > T))
    return pd.DataFrame(rows, columns=["day", "s_cents", "drift"])


def a23_cms_frequency(sf):
    # Count-Min Sketch replayed counter-by-counter: 4x256 md5 buckets,
    # point estimate = min over rows, reported for the true top-20
    from collections import Counter
    depth, width, topk = 4, 256, 20
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_partkey"])
    true_n = Counter(int(k) for k in li["l_partkey"])
    sketch = Counter()
    bucket = {}
    for k in true_n:
        bucket[k] = [_md5i(f"cms{i}_{k}") % width for i in range(depth)]
    for k, n in true_n.items():
        for i in range(depth):
            sketch[(i, bucket[k][i])] += n
    top = sorted(true_n.items(), key=lambda t: (-t[1], t[0]))[:topk]
    rows = [(k, n, min(sketch[(i, bucket[k][i])] for i in range(depth)))
            for k, n in top]
    return pd.DataFrame(rows, columns=["l_partkey", "true_n", "cms_n"])


def a23_cms_stream(sf):
    # streaming CMS twin: same sketch arithmetic over event user_ids
    # (depth 4, width 32, top 20)
    from collections import Counter
    depth, width, topk = 4, 32, 20
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
    ev = ev[ev["ts"].notna() & ev["user_id"].notna()]
    true_n = Counter(int(k) for k in ev["user_id"])
    bucket = {k: [_md5i(f"cms{i}_{k}") % width for i in range(depth)]
              for k in true_n}
    sketch = Counter()
    for k, n in true_n.items():
        for i in range(depth):
            sketch[(i, bucket[k][i])] += n
    top = sorted(true_n.items(), key=lambda t: (-t[1], t[0]))[:topk]
    rows = [(k, n, min(sketch[(i, bucket[k][i])] for i in range(depth)))
            for k, n in top]
    return pd.DataFrame(rows, columns=["user_id", "true_n", "cms_n"])


def e7_mixture_stats(sf):
    # per-source md5-threshold keep rates (src0:100, src1:1000,
    # src2:500, default 300 of 1000)
    rates = {"src0": 100, "src1": 1000, "src2": 500}
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "source"])
    rows = []
    for src, g in d.groupby("source"):
        r = rates.get(src, 300)
        kept = sum(1 for i in g["doc_id"]
                   if _md5i(f"mix_{int(i)}") % 1000 < r)
        rows.append((src, int(len(g)), kept))
    return pd.DataFrame(rows, columns=["source", "n_total", "n_kept"])


def e7_temperature(sf):
    # T=2 temperature smoothing: integer threshold floor(sqrt(n_min /
    # n_s) * 2^20) against md5-of-row-id mod 2^20
    import math
    scale = 1 << 20
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "source"])
    n = d.groupby("source").size().to_dict()
    n_min = min(n.values())
    rows = []
    for src in sorted(n):
        thresh = int(math.floor(math.sqrt(float(n_min) / float(n[src])) * scale))
        kept = sum(1 for i in d[d["source"] == src]["doc_id"]
                   if _md5i(f"temp_{int(i)}") % scale < thresh)
        rows.append((src, int(n[src]), kept))
    return pd.DataFrame(rows, columns=["source", "n_orig", "n_kept"])


def _top5(counts, key_name, item_name):
    # (key, item) -> n, ranked n desc / item asc, top 5 per key
    rows = []
    by_key = {}
    for (k, it), n in counts.items():
        by_key.setdefault(k, []).append((it, n))
    for k in sorted(by_key):
        ranked = sorted(by_key[k], key=lambda t: (-t[1], t[0]))[:5]
        for rk, (it, n) in enumerate(ranked, start=1):
            rows.append((k, it, n, rk))
    return pd.DataFrame(rows, columns=[key_name, item_name, "n", "rk"])


def e5_token_stats(sf):
    import re
    d = pd.read_parquet(
        f"{sf}/documents.parquet",
        columns=["lang", "source", "text", "n_chars"])
    d = d.copy()
    d["ntok"] = [len(re.split(r"\s+", str(t).strip())) for t in d["text"]]
    rows = []
    for (lang, src), g in d.groupby(["lang", "source"]):
        rows.append((lang, src, int(len(g)), int(g["ntok"].sum()),
                     exact_mean(g["n_chars"])))
    return pd.DataFrame(
        rows, columns=["lang", "source", "n_docs", "sum_tokens", "avg_chars"])


def e5_word_freq(sf):
    import re
    from collections import Counter
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["lang", "text"])
    counts = Counter()
    for lang, t in zip(d["lang"], d["text"]):
        for w in re.split(r"\s+", str(t).strip()):
            counts[(lang, w)] += 1
    return _top5(counts, "lang", "word")


def e5_char_trigrams(sf):
    from collections import Counter
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["lang", "text"])
    counts = Counter()
    for lang, t in zip(d["lang"], d["text"]):
        p = str(t).lower()[:200]
        for i in range(max(len(p) - 2, 0)):
            counts[(lang, p[i:i + 3])] += 1
    return _top5(counts, "lang", "tri")


def e1_dedup_exact(sf):
    d = pd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    g = d.groupby(["lang", "n_chars"])
    out = g.agg(doc_id=("doc_id", "min"), group_size=("doc_id", "size")) \
        .reset_index()[["doc_id", "lang", "n_chars", "group_size"]]
    out["group_size"] = out["group_size"].astype("int64")
    return out


def e1_passage_dedup(sf):
    # corpus-wide first-occurrence passage dedup (Lee et al.):
    # non-overlapping 8-token windows, global (doc_id, idx) order,
    # survivors reassemble per doc
    import re
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"]) \
        .sort_values("doc_id")
    seen = set()
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        toks = re.split(r"\s+", str(t).strip())
        kept_texts, n_passages, n_kept = [], 0, 0
        for idx in range(0, max(len(toks), 1), 8):
            p = " ".join(toks[idx:idx + 8])
            n_passages += 1
            if p not in seen:
                seen.add(p)
                n_kept += 1
                kept_texts.append(p)
        rows.append((int(i), n_passages, n_kept, " ".join(kept_texts)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_passages", "n_kept", "clean_text"])


def _cc_components(ids, pairs, min_est=0.5):
    # union-find with min-id representatives over the est-filtered
    # candidate graph
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), est in pairs.items():
        if est >= min_est and a in parent and b in parent:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def e2_dedup_clusters(sf):
    ids, pairs = _minhash_band_pairs(sf)
    comp = _cc_components(ids, pairs)
    from collections import Counter
    sizes = Counter(comp.values())
    return pd.DataFrame(
        [(i, comp[i], sizes[comp[i]]) for i in ids],
        columns=["doc_id", "component", "cluster_size"])


def e2_cluster_rep(sf):
    # nodes are only docs that appear in an est>=0.5 pair; the
    # representative is the longest doc (ties to min id)
    ids, pairs = _minhash_band_pairs(sf)
    nodes = set()
    for (a, b), est in pairs.items():
        if est >= 0.5:
            nodes.add(a)
            nodes.add(b)
    comp = _cc_components(nodes, pairs)
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "n_chars"])
    nch = {int(i): int(n) for i, n in zip(d["doc_id"], d["n_chars"])}
    from collections import Counter
    sizes = Counter(comp.values())
    best = {}
    for i in sorted(nodes):
        c = comp[i]
        if c not in best or nch[i] > nch[best[c]]:
            best[c] = i
    return pd.DataFrame(
        [(c, r, nch[r], sizes[c]) for c, r in sorted(best.items())],
        columns=["component", "rep_doc", "n_chars", "cluster_size"])


def _md5i(s):
    import hashlib
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def _split_of(doc_id):
    b = _md5i(f"split_{int(doc_id)}") % 1000
    return "train" if b < 800 else ("val" if b < 900 else "test")


def e7_split(sf):
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    return pd.DataFrame({
        "doc_id": d["doc_id"],
        "split": [_split_of(i) for i in d["doc_id"]]})


def e6_full_prep(sf):
    # The whole composed corpus-prep pipeline from first principles:
    # quality gate (token count + marker-vote language ID), exact
    # fingerprint dedup (min doc_id per md5), MinHash candidate pairs
    # >= 0.5 restricted to survivors, union-find connected components
    # keeping the min-id representative, shingle-overlap
    # decontamination vs the doc_id%20==0 benchmark, md5 split.
    import hashlib
    import re
    d = pd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"])
    texts = {int(i): str(t) for i, t in zip(d["doc_id"], d["text"])}
    en = {"the", "a", "of", "and", "is", "to"}
    de = {"der", "die", "das", "und", "ist", "zu"}
    fr = {"le", "la", "les", "et", "est", "de"}
    gated = {}
    for i, t in texts.items():
        toks = re.split(r"\s+", t.strip())
        ne, nd, nf = (sum(1 for x in toks if x in m) for m in (en, de, fr))
        lang = "en" if (ne >= nd and ne >= nf) else ("de" if nd >= nf else "fr")
        if len(toks) >= 5 and lang == "en":
            gated[i] = (len(toks), lang,
                        hashlib.md5(t.strip().lower().encode("utf-8")).hexdigest())
    # exact dedup: min doc_id per fingerprint
    by_fp = {}
    for i in sorted(gated):
        by_fp.setdefault(gated[i][2], i)
    exact = set(by_fp.values())
    # near-dup components among exact survivors (pairs est >= 0.5)
    _, pairs = _minhash_band_pairs(sf)
    parent = {i: i for i in exact}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), est in pairs.items():
        if est >= 0.5 and a in exact and b in exact:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    reps = {i for i in exact if find(i) == i}
    # corpus slice, decontamination vs benchmark shingles
    P = 1000000007
    mix = [((j + 1) * 999999937 + 17) % P for j in range(3)]

    def shingles(t):
        toks = re.split(r"\s+", t.strip())
        th = [_md5i(tok) % P for tok in toks]
        return {
            sum(th[k + j] * mix[j] % P for j in range(3)) % P
            for k in range(len(th) - 2)
        } if len(th) >= 3 else set()

    bench = set()
    for i, t in texts.items():
        if i % 20 == 0:
            bench |= shingles(t)
    rows = []
    for i in sorted(reps):
        if i % 20 == 0:
            continue
        if len(shingles(texts[i]) & bench) >= 5:
            continue
        n_tokens, lang, _ = gated[i]
        rows.append((i, n_tokens, lang, _split_of(i)))
    out = pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "lang_guess", "split"])
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out


def _minhash_band_pairs(sf, shingle_len=3):
    # full pure-Python replay of the MinHash/LSH front end
    # (MinHash.scala): whitespace tokens, md5 token hashes mod P,
    # position-weighted window hashes, 12 affine-permutation minima,
    # 4x3 band keys, bucket pairs, signature-agreement Jaccard
    import hashlib
    import re
    P = 1000000007
    H, BANDS, RPB = 12, 4, 3

    def md5i(s):
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)

    def a_const(i):
        a = ((2 * i + 1) * 1103515245 + 12345) % P
        return a if a != 0 else 1

    def b_const(i):
        return (i * 2654435761 + 1013904223) % P

    mix = [((j + 1) * 999999937 + 17) % P for j in range(shingle_len)]
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    sigs = {}
    for i, t in zip(d["doc_id"], d["text"]):
        toks = re.split(r"\s+", str(t).strip())
        th = [md5i(tok) % P for tok in toks]
        if len(th) < shingle_len:
            continue
        ms = [sum(th[k + j] * mix[j] % P for j in range(shingle_len)) % P
              for k in range(len(th) - shingle_len + 1)]
        sigs[int(i)] = [min((a_const(h) * m + b_const(h)) % P for m in ms)
                        for h in range(H)]
    buckets = {}
    for i, sig in sigs.items():
        for b in range(BANDS):
            key = (b, "_".join(str(v) for v in sig[b * RPB:(b + 1) * RPB]))
            buckets.setdefault(key, []).append(i)
    pairs = {}
    for members in buckets.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                k = (ms[x], ms[y])
                if k not in pairs:
                    sa, sb = sigs[k[0]], sigs[k[1]]
                    pairs[k] = sum(1 for p, q in zip(sa, sb) if p == q) / float(H)
    return ([int(v) for v in d["doc_id"]], pairs)


def e2_pagerank(sf, iters=3, min_est=0.5):
    # damped PageRank over the near-dup candidate graph, replayed with
    # the engine's arithmetic contract: double contribution division,
    # DECIMAL(28,10) per-target sums, double teleport+damp combine
    ids, pairs = _minhash_band_pairs(sf)
    und = []
    for (a, b), est in pairs.items():
        if est >= min_est:
            und.append((a, b))
            und.append((b, a))
    deg = {}
    for src, _ in und:
        deg[src] = deg.get(src, 0) + 1
    n = len(ids)
    pr = {i: 1.0 / n for i in ids}
    for _ in range(iters):
        sums = {}
        for src, dst in und:
            cd = dec10(pr[src] / float(deg[src]))
            sums[dst] = sums.get(dst, Decimal(0)) + cd
        pr = {i: 0.15 / n + (0.85 * float(sums[i]) if i in sums else 0.0)
              for i in ids}
    return pd.DataFrame(sorted(pr.items()), columns=["doc_id", "pr"])


def s19_rollup_incremental(sf):
    # incremental-maintenance law replayed as the full recompute in
    # pure int arithmetic: day-truncated key, BIGINT cents metrics
    import math
    o = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    day = pd.to_datetime(o["o_orderdate"]).dt.floor("D")
    cents = [int(math.floor(float(v) * 100)) for v in o["o_totalprice"]]
    rows = {}
    for d, c in zip(day, cents):
        n, nm, s_, mn, mx = rows.get(d, (0, 0, 0, None, None))
        rows[d] = (n + 1, nm + (0 if c is None else 1),
                   s_ + (0 if c is None else c),
                   mn if c is None else (c if mn is None else min(mn, c)),
                   mx if c is None else (c if mx is None else max(mx, c)))
    return pd.DataFrame(
        [(d, n, nm, s_, mn, mx) for d, (n, nm, s_, mn, mx) in rows.items()],
        columns=["day", "n", "n_m", "sum_m", "min_m", "max_m"])


def w11_streaks(sf, min_run=3):
    # gaps-and-islands run detection as a sequential per-user scan
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    out = []
    for uid, grp in ev.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        longest = cur = 0
        n_long = 0
        prev = None
        for v in g["value"]:
            if prev is not None and float(v) > float(prev):
                cur += 1
            else:
                if cur >= min_run:
                    n_long += 1
                longest = max(longest, cur)
                cur = 1
            prev = v
        if cur >= min_run:
            n_long += 1
        longest = max(longest, cur)
        out.append((int(uid), longest, n_long))
    return pd.DataFrame(out, columns=["user_id", "longest_streak", "n_long_streaks"])


def p11_quantile_bin(sf):
    # quantile_cont edges replayed: pos = p*(n-1); on quartile
    # fractions every step is dyadic-exact over integer cents
    import math
    o = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_totalprice"])
    cents = sorted(int(math.floor(float(v) * 100)) for v in o["o_totalprice"])
    n = len(cents)

    def q(p):
        pos = p * (n - 1)
        lo = math.floor(pos)
        frac = pos - lo
        return cents[lo] + (cents[min(lo + 1, n - 1)] - cents[lo]) * frac
    e1, e2, e3 = q(0.25), q(0.5), q(0.75)
    rows = {}
    for c in cents:
        b = 1 + (c > e1) + (c > e2) + (c > e3)
        cnt, mn, mx = rows.get(b, (0, None, None))
        rows[b] = (cnt + 1, c if mn is None else min(mn, c),
                   c if mx is None else max(mx, c))
    return pd.DataFrame(
        [(b, cnt, mn, mx) for b, (cnt, mn, mx) in sorted(rows.items())],
        columns=["bin", "n", "min_cents", "max_cents"])


def e2_bfs_hops(sf, seed_mod=50, max_hops=4):
    # textbook queue BFS over the reciprocal-kNN edges — a third
    # encoding beside Spark's frontier joins and DuckDB's unrolled
    # whole-set min-regrouping
    ids, edges = _mutual_knn_edges(sf)
    adj = {}
    for (a, b) in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    hops = {i: 0 for i in ids if i % seed_mod == 0}
    frontier = sorted(hops)
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in hops:
                    hops[v] = h
                    nxt.append(v)
        frontier = nxt
    return pd.DataFrame(sorted(hops.items()), columns=["vec_id", "hops"])


def s21_rollup_ndv(sf, k=64):
    # per-month KMV sketch replayed with hashlib directly (no engine
    # md5): min-k of distinct 32-bit hash prefixes + the estimator
    import hashlib
    import math
    o = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_orderdate", "o_custkey"])
    o = o[o["o_custkey"].notna()]
    month = pd.to_datetime(o["o_orderdate"]).values.astype("datetime64[M]")
    hs = {}
    for m, ck in zip(month, o["o_custkey"]):
        h = int(hashlib.md5(f"kmv_{int(ck)}".encode()).hexdigest()[:8], 16)
        hs.setdefault(m, set()).add(h)
    rows = []
    for m, s_ in sorted(hs.items()):
        mk = sorted(s_)[:k]
        n_min, h_k = len(mk), mk[-1]
        est = float(n_min) if n_min < k else (k - 1) * 4294967296.0 / h_k
        rows.append((pd.Timestamp(m), n_min, h_k, est))
    return pd.DataFrame(rows, columns=["month", "n_min", "h_k", "est_ndv"])


def e3_mrr_eval(sf, query_mod=10, k=10):
    # exact cosine ranking (the engine's fold order via _dot) and
    # integer lcm-scaled reciprocal ranks
    import math
    e = pd.read_parquet(f"{sf}/embeddings.parquet")
    emb = {int(v): list(a) for v, a in zip(e["vec_id"], e["embedding"])}
    lbl = {int(v): int(l) for v, l in zip(e["vec_id"], e["label"])}
    n2 = {i: _dot(v, v) for i, v in emb.items()}
    out = []
    for q in sorted(emb):
        if q % query_mod != 0:
            continue
        scored = sorted(
            ((_dot(emb[q], emb[c]) / (math.sqrt(n2[q]) * math.sqrt(n2[c])), c)
             for c in emb if c != q),
            key=lambda t: (-t[0], t[1]))[:k]
        first = None
        for rk, (_, c) in enumerate(scored, start=1):
            if lbl[c] == lbl[q]:
                first = rk
                break
        out.append((q, first, 0 if first is None else 2520 // first))
    return pd.DataFrame(out, columns=["query_id", "first_rel_rank", "rr_x2520"])


def a27_autocorr(sf):
    # lag-1 pairs per (user, type) in pure int cents; one float formula
    import math
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "event_type", "ts", "event_id", "value"])
    ev = ev[ev["value"].notna() & ev["ts"].notna()]
    moments = {}
    for (_, et), grp in ev.groupby(["user_id", "event_type"]):
        g = grp.sort_values(["ts", "event_id"])
        cents = [int(round_half_up(float(v) * 100)) for v in g["value"]]
        n, sc, sp, scp, scc, spp = moments.get(et, (0, 0, 0, 0, 0, 0))
        for prev, cur in zip(cents, cents[1:]):
            n += 1
            sc += cur
            sp += prev
            scp += cur * prev
            scc += cur * cur
            spp += prev * prev
        moments[et] = (n, sc, sp, scp, scc, spp)
    rows = [
        (et, n, float(n * scp - sc * sp)
         / (math.sqrt(float(n * scc - sc * sc)) * math.sqrt(float(n * spp - sp * sp))))
        for et, (n, sc, sp, scp, scc, spp) in moments.items()]
    return pd.DataFrame(rows, columns=["event_type", "n_pairs", "autocorr_lag1"])


def round_half_up(x):
    # Spark round(double) = HALF_UP on the SHORTEST-DECIMAL repr
    # (BigDecimal.valueOf) — replay exactly that; Python round() is
    # banker's and floor(x+0.5) mis-rounds 0.49999999999999994
    return int(Decimal(repr(float(x))).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def j13_interp_join(sf):
    # sequential two-scan bracket carry + the identical lerp expression
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "event_type", "ts", "event_id", "value"])
    ev = ev[ev["ts"].notna()]
    out = []
    for _, grp in ev[ev["event_type"].isin(["purchase", "click"])].groupby("user_id"):
        rows = []
        for _, r in grp.iterrows():
            if r["event_type"] == "purchase" and pd.notna(r["value"]):
                rows.append((r["ts"], 0, int(r["event_id"]), float(r["value"])))
            elif r["event_type"] == "click":
                rows.append((r["ts"], 1, int(r["event_id"]), None))
        rows.sort(key=lambda t: (t[0], t[1], t[2]))
        us = [int(pd.Timestamp(t).value // 1000) for t, _, _, _ in rows]
        prevs, pv = [], (None, None)
        for (t, q, eid, v), u in zip(rows, us):
            if v is not None:
                pv = (v, u)
            prevs.append(pv)
        nxts, nv = [None] * len(rows), (None, None)
        for i in range(len(rows) - 1, -1, -1):
            if rows[i][3] is not None:
                nv = (rows[i][3], us[i])
            nxts[i] = nv
        for (t, q, eid, v), u, (pvv, pt), (nvv, nt) in zip(rows, us, prevs, nxts):
            if q == 1:
                interp = None
                if pt is not None and nt is not None:
                    interp = pvv + (nvv - pvv) * (float(u - pt) / float(nt - pt))
                out.append((eid, int(grp["user_id"].iloc[0]), t, interp))
    return pd.DataFrame(out, columns=["event_id", "user_id", "ts", "v_interp"])


def s22_zonemap_skip(sf):
    # the pruned scan must equal the plain filtered truth — replay the
    # filter only (zone-map soundness is exactly "skipping changed
    # nothing"); shared verbatim by the streaming manifest twin
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    d = pd.to_datetime(o["o_orderdate"])
    m = (d >= pd.Timestamp("1996-01-01")) & (d < pd.Timestamp("1996-07-01"))
    return o[m].reset_index(drop=True)


def s23_snapshot_diff(sf):
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    o = o.assign(cents=[int(math.floor(float(v) * 100)) for v in o["o_totalprice"]])
    v1 = o[o["o_orderkey"] % 97 != 0][["o_orderkey", "o_custkey", "cents"]]
    v2 = o[o["o_orderkey"] % 101 != 0][["o_orderkey", "o_custkey", "cents"]].copy()
    v2["cents"] = [c + 100 if k % 89 == 0 else c
                   for k, c in zip(v2["o_orderkey"], v2["cents"])]
    m = v1.merge(v2, on="o_orderkey", how="outer", suffixes=("_1", "_2"))
    rows = []
    for r in m.itertuples():
        if pd.isna(r.cents_1):
            rows.append((int(r.o_orderkey), "I", None, int(r.cents_2)))
        elif pd.isna(r.cents_2):
            rows.append((int(r.o_orderkey), "D", int(r.cents_1), None))
        elif int(r.cents_1) != int(r.cents_2) or \
                int(r.o_custkey_1) != int(r.o_custkey_2):
            rows.append((int(r.o_orderkey), "U", int(r.cents_1), int(r.cents_2)))
    out = pd.DataFrame(rows, columns=["o_orderkey", "op", "old_cents", "new_cents"])
    # nullable long columns read back as float64; cents < 2^53 are exact
    return out.astype({"old_cents": "float64", "new_cents": "float64"})


def j14_bloom_join(sf):
    # the bloom filter may only PRUNE non-matching probe rows — the
    # result is the plain selective join, replayed here
    import math
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"])
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderpriority"])
    o = o[o["o_orderpriority"] == "1-URGENT"]
    li = li.assign(
        cents=[int(math.floor(float(v) * 100)) for v in li["l_extendedprice"]])
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    g = (m.groupby("o_custkey")
         .agg(n_items=("cents", "size"), cents=("cents", "sum")).reset_index())
    return g[["o_custkey", "n_items", "cents"]]


def j16_cbo_reorder(sf):
    # CBO may only change the JOIN ORDER — the result is the plain
    # 3-way star join, replayed here
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    n = pd.read_parquet(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"])
    n = n[n["n_name"] == "NATION_7"]
    o = o.assign(
        cents=[int(math.floor(float(v) * 100)) for v in o["o_totalprice"]])
    m = (o.merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(n, left_on="c_nationkey", right_on="n_nationkey"))
    g = (m.groupby("n_name")
         .agg(n_orders=("cents", "size"), cents=("cents", "sum")).reset_index())
    return g[["n_name", "n_orders", "cents"]]


def s30_mv_rewrite(sf):
    # The MV rewrite may only change WHICH table the plan scans — the
    # result is the plain grouped aggregate over orders, replayed here
    # from the fact parquet (so a stale/corrupt rollup artifact on the
    # Spark side diverges three engines, not two)
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    o = o.assign(
        cents=[int(math.floor(float(v) * 100)) for v in o["o_totalprice"]])
    g = (o.groupby("o_custkey")
         .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"),
              min_cents=("cents", "min"), max_cents=("cents", "max"))
         .reset_index())
    g["avg_cents"] = [float(s) / float(n)
                      for s, n in zip(g["sum_cents"], g["n_orders"])]
    return g


def s33_mv_multikey(sf):
    # multi-key MV substitution may only change WHICH table the plan
    # scans — the result is the plain (day, custkey) grouped aggregate
    # over the fact parquet
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderdate", "o_custkey", "o_totalprice"])
    o = o.assign(
        day=pd.to_datetime(o["o_orderdate"]).dt.floor("D"),
        cents=[int(math.floor(float(v) * 100)) for v in o["o_totalprice"]])
    return (o.groupby(["day", "o_custkey"])
            .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"),
                 min_cents=("cents", "min"), max_cents=("cents", "max"))
            .reset_index())


def s34_mv_coarsen(sf):
    # lattice coarsening: day-only group-by with the custkey predicate
    # applied on FACT rows — if the rule's rollup-side pushdown +
    # re-aggregation were unsound, this fact-side replay diverges
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderdate", "o_custkey", "o_totalprice"])
    o = o[o["o_custkey"] % 2 == 0]
    o = o.assign(
        day=pd.to_datetime(o["o_orderdate"]).dt.floor("D"),
        cents=[int(math.floor(float(v) * 100)) for v in o["o_totalprice"]])
    return (o.groupby("day")
            .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"),
                 min_cents=("cents", "min"), max_cents=("cents", "max"))
            .reset_index())


def s41_mv_choose(sf):
    # cost-based MV choice may only change WHICH rollup the plan reads
    # (daily vs day-by-customer); the answer stays the plain fact-side
    # day rollup, replayed here straight off the fact table
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    o = o.assign(
        day=pd.to_datetime(o["o_orderdate"]).dt.floor("D"),
        cents=[int(math.floor(float(v) * 100)) for v in o["o_totalprice"]])
    return (o.groupby("day")
            .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"),
                 min_cents=("cents", "min"), max_cents=("cents", "max"))
            .reset_index())


def s35_mv_avg(sf):
    # avg()/count(metric) under MV substitution may only change WHICH
    # table the plan scans — the result is the plain grouped aggregate
    # over orders; avg replayed as float(exact_sum)/float(nonnull_n),
    # the same single IEEE divide both engines reach
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    o = o.assign(
        cents=[int(math.floor(float(v) * 100)) for v in o["o_totalprice"]])
    g = (o.groupby("o_custkey")
         .agg(n_priced=("cents", "count"), sum_cents=("cents", "sum"))
         .reset_index())
    g["avg_cents"] = [float(s) / float(n)
                      for s, n in zip(g["sum_cents"], g["n_priced"])]
    return g[["o_custkey", "avg_cents", "n_priced", "sum_cents"]]


def s36_mv_cdc(sf):
    # CDC-maintained rollup must equal the full POST-image rollup: the
    # changelog (1997-only inserts/deletes/updates/key-moves in the
    # %13/%17/%19/%23 precedence) applied row-by-row in pure Python,
    # then the day rollup recomputed from scratch
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    day = pd.to_datetime(o["o_orderdate"]).dt.floor("D")
    rows = {}
    for k, d, v in zip(o["o_orderkey"], day, o["o_totalprice"]):
        k = int(k)
        c = int(math.floor(float(v) * 100))
        yr = d.year == 1997
        ins = yr and k % 13 == 3
        dele = yr and not ins and k % 17 == 5
        upd = yr and not ins and not dele and k % 19 == 7
        mov = yr and not ins and not dele and not upd and k % 23 == 11
        if dele:
            continue
        if upd:
            c = c + k % 1000
        if mov:
            d = d + pd.Timedelta(days=7)
        n, nm, s_, mn, mx = rows.get(d, (0, 0, 0, None, None))
        rows[d] = (n + 1, nm + 1, s_ + c,
                   c if mn is None else min(mn, c),
                   c if mx is None else max(mx, c))
    return pd.DataFrame(
        [(d, n, nm, s_, mn, mx) for d, (n, nm, s_, mn, mx) in rows.items()],
        columns=["day", "n", "n_m", "sum_m", "min_m", "max_m"])


def s37_mv_join(sf):
    # the joined-MV substitution may only change WHICH tables the plan
    # scans — the result is the plain orders ⋈ customer aggregate by
    # c_nationkey, replayed from the two base parquets (a stale joined
    # rollup on the Spark side diverges three engines, not two)
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey", how="inner")
    j = j.assign(
        cents=[int(math.floor(float(v) * 100)) for v in j["o_totalprice"]])
    g = (j.groupby("c_nationkey")
         .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"),
              min_cents=("cents", "min"), max_cents=("cents", "max"))
         .reset_index())
    g["avg_cents"] = [float(s) / float(n)
                      for s, n in zip(g["sum_cents"], g["n_orders"])]
    return g


def s38_mv_join_refresh(sf):
    # refresh ⊕ joined rewrite: result is the plain join aggregate by
    # c_mktsegment — only matches if (pre ⋈ dim) ⊕ (delta ⋈ dim)
    # ≡ (whole fact ⋈ dim) held through the stored-artifact round-trip
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey", how="inner")
    j = j.assign(
        cents=[int(math.floor(float(v) * 100)) for v in j["o_totalprice"]])
    return (j.groupby("c_mktsegment")
            .agg(n=("cents", "size"), n_m=("cents", "count"),
                 sum_m=("cents", "sum"), min_m=("cents", "min"),
                 max_m=("cents", "max"))
            .reset_index())


def s39_mv_join_stream(sf):
    # streaming joined-rollup maintenance must land on the full
    # orders ⋈ customer rollup by nation regardless of batching
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey", how="inner")
    j = j.assign(
        cents=[int(math.floor(float(v) * 100)) for v in j["o_totalprice"]])
    return (j.groupby("c_nationkey")
            .agg(n=("cents", "size"), n_m=("cents", "count"),
                 sum_m=("cents", "sum"), min_m=("cents", "min"),
                 max_m=("cents", "max"))
            .reset_index())


def s40_mv_join_dimcdc(sf):
    # dim-side CDC maintenance must equal the full post-image join
    # rollup: NATION_3 customers with c_custkey % 5 == 4 re-homed to
    # nation 10 in pure Python, then the nation rollup recomputed
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    c = c.assign(c_nationkey=[
        10 if (int(n) == 3 and int(k) % 5 == 4) else int(n)
        for k, n in zip(c["c_custkey"], c["c_nationkey"])])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey", how="inner")
    j = j.assign(
        cents=[int(math.floor(float(v) * 100)) for v in j["o_totalprice"]])
    return (j.groupby("c_nationkey")
            .agg(n=("cents", "size"), n_m=("cents", "count"),
                 sum_m=("cents", "sum"), min_m=("cents", "min"),
                 max_m=("cents", "max"))
            .reset_index())


def s42_topk_maintain(sf, k=7):
    # incremental leaderboard must equal the whole-table top-k per
    # priority under the (cents desc, orderkey asc) total order
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
    o = o[o["o_totalprice"].notna() & o["o_orderkey"].notna()]
    o = o.assign(
        cents=[int(math.floor(float(v) * 100)) for v in o["o_totalprice"]])
    rows = []
    for prio, g in o.groupby("o_orderpriority"):
        ranked = sorted(
            ((-int(c), int(i)) for i, c in zip(g["o_orderkey"], g["cents"])))[:k]
        for rk, (negc, i) in enumerate(ranked, start=1):
            rows.append((prio, i, -negc, rk))
    return pd.DataFrame(
        rows, columns=["o_orderpriority", "o_orderkey", "cents", "rk"])


def s46_deletion_vectors(sf):
    # positional delete application must equal the predicate applied
    # to rows: the replay filters rows directly
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"])
    o = o[~(o["o_custkey"] % 10 == 3)]
    o = o.assign(
        cents=[int(math.floor(float(v) * 100)) for v in o["o_totalprice"]])
    return (o.groupby("o_orderpriority")
            .agg(n_live=("cents", "size"), sum_cents=("cents", "sum"))
            .reset_index())


def o16_attribution(sf, window_us=7 * 24 * 3600 * 1000000):
    # first/last-touch replayed per purchase with explicit (ts, id)
    # ordering over the same 7-day click window
    e = pd.read_parquet(f"{sf}/events.parquet",
                        columns=["user_id", "event_type", "ts", "event_id"])
    e = e.assign(us=[int(pd.Timestamp(t).value) // 1000 for t in e["ts"]])
    clicks = {}
    for u, t, i in zip(e[e["event_type"] == "click"]["user_id"],
                       e[e["event_type"] == "click"]["us"],
                       e[e["event_type"] == "click"]["event_id"]):
        clicks.setdefault(int(u), []).append((int(t), int(i)))
    rows = []
    p = e[e["event_type"] == "purchase"]
    for u, t, i in zip(p["user_id"], p["us"], p["event_id"]):
        cs = [(ct, ci) for ct, ci in clicks.get(int(u), [])
              if ct <= int(t) and int(t) - ct <= window_us]
        if cs:
            rows.append((int(i), min(cs)[1], max(cs)[1], len(cs)))
    return pd.DataFrame(
        rows, columns=["pid", "first_click", "last_click", "n_touches"])


def o17_multi_touch(sf, window_us=7 * 24 * 3600 * 1000000):
    # U-shaped multi-touch credit replayed with raw integer arithmetic:
    # bp weights (10000 / 5000+5000 / 4000+4000+middles of
    # 2000//(n-2) with remainder to the earliest middles), credit =
    # cents*bp//10000, rolled up per click channel (props.k % 8)
    import json as _json
    e = pd.read_parquet(
        f"{sf}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id", "value", "props"])
    e = e.assign(us=[int(pd.Timestamp(t).value) // 1000 for t in e["ts"]])
    clicks = {}
    ce = e[e["event_type"] == "click"]
    for u, t, i, pr in zip(ce["user_id"], ce["us"], ce["event_id"], ce["props"]):
        ch = int(_json.loads(pr)["k"]) % 8
        clicks.setdefault(int(u), []).append((int(t), int(i), ch))
    agg = {}
    p = e[(e["event_type"] == "purchase") & e["value"].notna()]
    for u, t, val in zip(p["user_id"], p["us"], p["value"]):
        cents = int(round(float(val) * 100))
        cs = sorted((ct, ci, ch) for ct, ci, ch in clicks.get(int(u), [])
                    if ct <= int(t) and int(t) - ct <= window_us)
        n = len(cs)
        if n == 0:
            continue
        for idx, (ct, ci, ch) in enumerate(cs, start=1):
            if n == 1:
                bp = 10000
            elif n == 2:
                bp = 5000
            elif idx == 1 or idx == n:
                bp = 4000
            else:
                bp = 2000 // (n - 2) + (1 if idx - 1 <= 2000 % (n - 2) else 0)
            cnt, cred = agg.get(ch, (0, 0))
            agg[ch] = (cnt + 1, cred + (cents * bp) // 10000)
    rows = [(ch, c_, cr) for ch, (c_, cr) in sorted(agg.items())]
    return pd.DataFrame(rows, columns=["channel", "n_touches", "credit_cents"])


def a29_retention_bitmap(sf):
    # month-over-month retained distinct customers, replayed with raw
    # python sets — the engine reads the same counts off two bitmaps
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderdate", "o_custkey"])
    month = pd.to_datetime(o["o_orderdate"]).values.astype("datetime64[M]")
    seen = {}
    for m, ck in zip(month, o["o_custkey"]):
        seen.setdefault(m, set())
        if pd.notna(ck):
            seen[m].add(int(ck))
    months = sorted(seen)
    rows = []
    for m in months:
        nxt = (m.astype("datetime64[M]") + 1) if hasattr(m, "astype") else m
        nxt = m + 1  # datetime64[M] arithmetic: +1 month
        if nxt in seen:
            rows.append((pd.Timestamp(m), len(seen[m]), len(seen[nxt]),
                         len(seen[m] & seen[nxt])))
    return pd.DataFrame(rows,
                        columns=["month", "n_month", "n_next", "n_retained"])


def j20_left_elim(sf):
    # left-join elimination may only drop the parent scan; under the
    # data's FK the left join is the identity on fact rows
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"])
    c = pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey", how="left")
    j = j.assign(
        cents=[int(math.floor(float(v) * 100)) for v in j["o_totalprice"]])
    return (j.groupby("o_orderpriority")
            .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"))
            .reset_index())


def s48_count_distinct_elim(sf):
    # the stripped DISTINCT is sound only under real uniqueness: the
    # replay computes the true distinct count per nation
    c = pd.read_parquet(f"{sf}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    return (c.groupby("c_nationkey")
            .agg(n_cust=("c_custkey", "nunique"), n_rows=("c_custkey", "size"))
            .reset_index())


def j19_elim_then_mv(sf):
    # the two-step plan collapse may only change WHICH tables the plan
    # reads; the answer is the join's per-customer rollup, replayed
    # here WITH the join
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey", how="inner")
    j = j.assign(
        cents=[int(math.floor(float(v) * 100)) for v in j["o_totalprice"]])
    return (j.groupby("o_custkey")
            .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"),
                 min_cents=("cents", "min"), max_cents=("cents", "max"))
            .reset_index())


def s47_mor_upsert(sf):
    # position-delete + appended post-image must compose to exactly one
    # CURRENT version per row: the replay applies the update directly
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"])
    o = o.assign(cents=[
        int(math.floor(float(v) * 100)) + (100 if int(k) % 7 == 2 else 0)
        for v, k in zip(o["o_totalprice"], o["o_custkey"])])
    return (o.groupby("o_orderpriority")
            .agg(n_rows=("cents", "size"), sum_cents=("cents", "sum"),
                 max_cents=("cents", "max"))
            .reset_index())


def s45_distinct_elim(sf):
    # eliminated dedup-by-PK must be the identity on the table
    return pd.read_parquet(
        f"{sf}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])


def s44_count_pushdown(sf):
    # footer-statistics pushdown may only change WHERE the numbers come
    # from; the replay recomputes them from the rows themselves
    o = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_orderkey"])
    return pd.DataFrame([(len(o), int(o["o_orderkey"].min()),
                          int(o["o_orderkey"].max()))],
                        columns=["n_orders", "min_key", "max_key"])


def j18_join_elim(sf):
    # join elimination may only DROP the parent scan; the answer is the
    # full join's rollup, replayed here WITH the join so an unsound
    # elimination (dropped or duplicated child rows) diverges
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"])
    c = pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey", how="inner")
    j = j.assign(
        cents=[int(math.floor(float(v) * 100)) for v in j["o_totalprice"]])
    return (j.groupby("o_orderpriority")
            .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"))
            .reset_index())


def s43_mv_metastore(sf):
    # the metastore round-trip may only change WHICH table the plan
    # scans; the answer is the plain per-priority cents rollup
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderpriority", "o_totalprice"])
    o = o.assign(
        cents=[int(math.floor(float(v) * 100)) for v in o["o_totalprice"]])
    return (o.groupby("o_orderpriority")
            .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"),
                 min_cents=("cents", "min"), max_cents=("cents", "max"))
            .reset_index())


def s32_rollup_quantile(sf, k=64):
    # per-month bottom-k-by-hash sample replayed with hashlib directly:
    # min-k (h, v) pairs under the (h, v) total order, then type-1
    # quartile order statistics of the sample — pure int arithmetic
    import hashlib
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderdate", "o_orderkey", "o_totalprice"])
    o = o[o["o_orderkey"].notna() & o["o_totalprice"].notna()]
    month = pd.to_datetime(o["o_orderdate"]).values.astype("datetime64[M]")
    hv = {}
    for m, ok, tp in zip(month, o["o_orderkey"], o["o_totalprice"]):
        h = int(hashlib.md5(f"qsk_{int(ok)}".encode()).hexdigest()[:8], 16)
        hv.setdefault(m, []).append((h, int(math.floor(float(tp) * 100))))
    rows = []
    for m, pairs in sorted(hv.items()):
        vs = sorted(v for _, v in sorted(pairs)[:k])
        ns = len(vs)
        rows.append((pd.Timestamp(m), ns,
                     vs[((ns - 1) * 1) // 4],
                     vs[((ns - 1) * 2) // 4],
                     vs[((ns - 1) * 3) // 4]))
    return pd.DataFrame(
        rows, columns=["month", "n_s", "est_p25", "est_p50", "est_p75"])


def j17_aqe_skew(sf):
    # AQE skew splitting may only change task boundaries — the result
    # is the plain flag-dimension join, replayed here
    import math
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"])
    li = li.assign(
        cents=[int(math.floor(float(v) * 100)) for v in li["l_extendedprice"]])
    flag = li.groupby("l_returnflag")["cents"].sum().to_dict()
    rows = [(rf, ls, len(g), int(g["cents"].sum()), int(flag[rf]))
            for (rf, ls), g in li.groupby(["l_returnflag", "l_linestatus"])]
    return pd.DataFrame(rows, columns=[
        "l_returnflag", "l_linestatus", "n", "cents", "flag_cents"])


def j15_join_size_profile(sf):
    # per-key |L_k|*|R_k| contributions bucketed by bit_length — the
    # same integer-exact floor(log2)+1 both engines compute as
    # length(bin(x))
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
    ev = ev[ev["user_id"].notna()]
    o = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_custkey"])
    lc = ev.groupby("user_id").size()
    rc = o.groupby("o_custkey").size()
    buckets = {}
    for k, l in lc.items():
        if k in rc.index:
            contrib = int(l) * int(rc[k])
            b = contrib.bit_length()
            nk, rows = buckets.get(b, (0, 0))
            buckets[b] = (nk + 1, rows + contrib)
    return pd.DataFrame(
        [(b, n, r) for b, (n, r) in buckets.items()],
        columns=["bucket", "n_keys", "rows_in_bucket"])


def e2_sssp_weighted(sf, seed_mod=50, rounds=4):
    # synchronous Bellman-Ford truncated at `rounds` edges, integer
    # micro-dissimilarity weights — a THIRD encoding beside Spark's
    # frontier relaxation and DuckDB's whole-table re-relaxation
    import math
    ids, edges = _mutual_knn_edges(sf)
    adj = {}
    for (a, b), cos in edges.items():
        w = int(math.floor((1.0 - cos) * 1000000)) + 1
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {i: 0 for i in ids if i % seed_mod == 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for i, d in dist.items():  # read OLD dist only: synchronous rounds
            for j, w in adj.get(i, []):
                if j not in nxt or d + w < nxt[j]:
                    nxt[j] = d + w
        dist = nxt
    return pd.DataFrame(sorted(dist.items()), columns=["vec_id", "dist"])


def p13_ref_integrity(sf):
    def one(name, child, key, parent, pkey, pfilter=None):
        c = pd.read_parquet(f"{sf}/{child}.parquet", columns=[key])
        keys = [int(v) for v in c[key] if pd.notna(v)]
        p = pd.read_parquet(f"{sf}/{parent}.parquet", columns=[pkey])
        pk = {int(v) for v in p[pkey] if pd.notna(v)}
        if pfilter:
            pk = {v for v in pk if pfilter(v)}
        orphans = [v for v in keys if v not in pk]
        return (name, len(keys), len(orphans), len(set(orphans)))
    rows = [
        one("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
        one("orders.o_custkey->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
        one("customer.c_nationkey->nation", "customer", "c_nationkey",
            "nation", "n_nationkey"),
        one("supplier.s_nationkey->nation", "supplier", "s_nationkey",
            "nation", "n_nationkey"),
        one("nation.n_regionkey->region", "nation", "n_regionkey",
            "region", "r_regionkey"),
        one("orders.o_custkey->customer[corrupted]", "orders", "o_custkey",
            "customer", "c_custkey", lambda v: v % 13 != 0),
    ]
    return pd.DataFrame(
        rows, columns=["relationship", "n_child", "n_orphans", "n_orphan_keys"])


def _o15_state(sf):
    # per-customer RFM from first principles: integer metrics, exact
    # bracketing order statistics (k = (p*(n-1))//4, q = (p*(n-1))%4),
    # score compares in pure-integer scale-by-4 arithmetic — the same
    # rank rule the engine and the DuckDB oracle now share (r12 flake
    # fix: no interpolated doubles anywhere). Shared by the o15 family
    # (main query + the three r14 driver-localization companions).
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    per = {}
    for ck, dt, pr in zip(o["o_custkey"], pd.to_datetime(o["o_orderdate"]),
                          o["o_totalprice"]):
        last, f, m = per.get(int(ck), (None, 0, 0))
        d = dt.normalize()
        per[int(ck)] = (d if last is None or d > last else last,
                        f + 1, m + int(math.floor(float(pr) * 100)))
    anchor = max(last for last, _, _ in per.values())
    rows = {ck: ((anchor - last).days, f, m) for ck, (last, f, m) in per.items()}
    n = len(rows)

    def edges(vals):
        v = sorted(vals)
        out = []
        for p in (1, 2, 3):
            k, q = divmod(p * (n - 1), 4)
            out.append((v[k], v[min(k + 1, n - 1)], q))
        return out
    rd = [r for r, _, _ in rows.values()]
    fs = [f for _, f, _ in rows.values()]
    ms = [m for _, _, m in rows.values()]
    return rows, n, edges(rd), edges(fs), edges(ms)


def _o15_score(x, es):
    return 1 + sum(4 * x > (4 - q) * xk + q * xk1 for xk, xk1, q in es)


def o15_rfm_segments(sf):
    rows, n, re_, fe, me = _o15_state(sf)
    out = [(ck, r, f, m,
            (5 - _o15_score(r, re_)) * 100 + _o15_score(f, fe) * 10
            + _o15_score(m, me))
           for ck, (r, f, m) in sorted(rows.items())]
    return pd.DataFrame(
        out, columns=["o_custkey", "r_days", "f", "m_cents", "segment"])


def o15_edges(sf):
    # the full intermediate rank state as one row: n + the 18
    # bracketing order statistics the engine/oracle scoring reads
    rows, n, re_, fe, me = _o15_state(sf)
    rec, cols = [n], ["n"]
    for pfx, es in (("r", re_), ("f", fe), ("m", me)):
        for p, (xk, xk1, _q) in enumerate(es, start=1):
            rec += [xk, xk1]
            cols += [f"{pfx}_x{p}0", f"{pfx}_x{p}1"]
    return pd.DataFrame([rec], columns=cols)


def o15_scores(sf):
    rows, n, re_, fe, me = _o15_state(sf)
    out = [(ck, _o15_score(r, re_), _o15_score(f, fe), _o15_score(m, me))
           for ck, (r, f, m) in sorted(rows.items())]
    return pd.DataFrame(
        out, columns=["o_custkey", "r_score", "f_score", "m_score"])


def o15_rowhash(sf):
    # the o15 rows reduced to per-row md5 strings (string-typed
    # artifact sidesteps any int64 hash-canonicalization sensitivity)
    import hashlib
    base = o15_rfm_segments(sf)
    out = [(int(ck),
            hashlib.md5("|".join(str(int(v)) for v in
                                 (ck, r, f, m, s)).encode()).hexdigest())
           for ck, r, f, m, s in base.itertuples(index=False)]
    return pd.DataFrame(out, columns=["o_custkey", "row_md5"])


def w9_dedup_stream(sf):
    # replay the STREAMING gate's staged construction from first
    # principles: events ∪ md5-selected ~20% duplicate slice → exact
    # dedup by event_id → the (event_id, event_type, cents) row set
    # the dropDuplicatesWithinWatermark plan must restore
    import hashlib

    def md5i(s):
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
    ev = pd.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"])
    dup = ev[[md5i(f"dup_{int(i)}") % 5 == 0 for i in ev["event_id"]]]
    staged = pd.concat([ev, dup])
    dedup = staged.drop_duplicates(subset=["event_id"])
    rows = [(int(i), t, round_half_up(float(v) * 100))
            for i, t, v in zip(dedup["event_id"], dedup["event_type"],
                               dedup["value"])]
    return pd.DataFrame(rows, columns=["event_id", "event_type", "cents"])


def s27_bloom_skip(sf):
    # Bloom skipping is sound iff the probe result IS the plain
    # equality truth table; replay that table from first principles.
    od = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    return od[od["o_custkey"] == od["o_custkey"].min()].reset_index(drop=True)


def s28_compound_skip(sf):
    od = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-07-01")
    win = od[(od["o_orderdate"] >= lo) & (od["o_orderdate"] < hi)]
    return win[win["o_custkey"] == win["o_custkey"].min()].reset_index(drop=True)


def s25_cdc_apply(sf):
    # base ⊕ changelog ≡ v2: replay the version constructions and the
    # merge in pure dict arithmetic (insert/update replace, delete
    # drops), never consulting either engine's join
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    base = {}
    v2 = {}
    for k, ck, pr in zip(o["o_orderkey"], o["o_custkey"], o["o_totalprice"]):
        k, ck = int(k), int(ck)
        cents = int(math.floor(float(pr) * 100))
        if k % 97 != 0:
            base[k] = (ck, cents)
        if k % 101 != 0:
            v2[k] = (ck, cents + 100 if k % 89 == 0 else cents)
    merged = dict(base)
    for k in set(base) | set(v2):
        if k not in v2:
            merged.pop(k, None)          # D
        elif k not in base or base[k] != v2[k]:
            merged[k] = v2[k]            # I / U
    rows = [(k, ck, c) for k, (ck, c) in sorted(merged.items())]
    return pd.DataFrame(rows, columns=["o_orderkey", "o_custkey", "cents"])


# ---- Full-registry closure replays (r14) -----------------------------------
# The remaining 55 batch queries that had only the DuckDB opinion —
# projections, joins, window/rank families, scalar-function toolkits,
# format round-trips, set/bag ops, metadata/layout queries — so EVERY
# registered query now carries the pure-Python third opinion.


def p1_normalize_names(sf):
    li = _t(sf, "lineitem", ["l_returnflag"])
    g = li.groupby("l_returnflag").size().reset_index(name="n")
    return g


def p2_coerce_cast(sf):
    import json as _json
    ev = _t(sf, "events", ["event_id", "event_type", "props"])
    rows = []
    for i, et, pr in zip(ev["event_id"], ev["event_type"], ev["props"]):
        k = None
        if pd.notna(pr):
            v = _json.loads(pr).get("k")
            if v is not None:
                try:
                    k = float(v)
                except ValueError:
                    k = None
        try:
            et_num = float(et)
        except (ValueError, TypeError):
            et_num = None
        rows.append((int(i), k, et_num))
    return pd.DataFrame(rows, columns=["event_id", "k_val", "et_num"])


def p3_null_drop(sf):
    ev = _t(sf, "events", ["event_id", "event_type", "value"])
    m = ev[(ev["event_type"].isna() | (ev["event_type"] != "error"))
           & ev["value"].notna()]
    return m[["event_id", "value"]].rename(columns={"value": "v"}).reset_index(drop=True)


def p4_filter(sf):
    li = _t(sf, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity",
                             "l_returnflag"])
    return li[li["l_returnflag"] == "R"][
        ["l_orderkey", "l_linenumber", "l_quantity"]].reset_index(drop=True)


def p5_project(sf):
    return _t(sf, "customer", ["c_custkey", "c_name", "c_mktsegment"])


def p6_drop(sf):
    return _t(sf, "supplier", ["s_suppkey", "s_name", "s_nationkey"])


def p8_profile(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_orderstatus",
                          "o_totalprice", "o_orderdate", "o_orderpriority"])
    rows = [(c, len(o), int(o[c].isna().sum()), int(o[c].nunique()))
            for c in o.columns]
    return pd.DataFrame(rows, columns=["column_name", "n_rows", "n_nulls",
                                       "n_distinct"])


def p10_expectations(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_orderstatus",
                          "o_totalprice"])
    n = len(o)
    ck = int(o["o_custkey"].notna().sum())
    tp = int(o["o_totalprice"].notna().sum())
    ok_ = int(o["o_orderkey"].notna().sum())
    okd = int(o["o_orderkey"].nunique())
    oor = int(sum(1 for v in o["o_totalprice"]
                  if pd.notna(v) and (v < 0.0 or v > 1000000.0)))
    oos = int(sum(1 for v in o["o_orderstatus"]
                  if pd.notna(v) and v not in ("F", "O", "P")))
    rows = [
        ("complete", "o_custkey", ck / n, 0.95, ck / n >= 0.95),
        ("complete", "o_totalprice", tp / n, 0.99, tp / n >= 0.99),
        ("unique", "o_orderkey", float(ok_ - okd), 0.0, ok_ == okd),
        ("in_range[0.0,1000000.0]", "o_totalprice", float(oor), 0.0, oor == 0),
        ("in_set", "o_orderstatus", float(oos), 0.0, oos == 0),
    ]
    return pd.DataFrame(rows, columns=["check", "column_name", "metric",
                                       "threshold", "passed"])


def p12_feature_matrix(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_orderpriority",
                          "o_orderdate", "o_totalprice"])
    import math
    vd = {int(k): _dec(v, Q10) for k, v in zip(o["o_orderkey"], o["o_totalprice"])}
    cents = {int(k): int(math.floor(float(v) * 100))
             for k, v in zip(o["o_orderkey"], o["o_totalprice"])}
    grp = {}
    for k, p in zip(o["o_orderkey"], o["o_orderpriority"]):
        g = grp.setdefault(p, [0, Decimal(0)])
        g[0] += 1
        g[1] += vd[int(k)]
    edges = _qcont(sorted(cents.values()), (0.25, 0.5, 0.75))
    ncust = o.groupby("o_custkey").size().to_dict()
    prev = {}
    for _, r in o.sort_values(["o_orderdate", "o_orderkey"]).iterrows():
        ck = r["o_custkey"]
        k = int(r["o_orderkey"])
        if pd.notna(ck):
            p = prev.get(int(ck))
            prev[int(ck)] = (r["o_orderdate"], k, p[0] if p else None)
    # second pass for lag: recompute sequentially
    lag = {}
    last = {}
    for _, r in o.sort_values(["o_orderdate", "o_orderkey"]).iterrows():
        ck = r["o_custkey"]
        k = int(r["o_orderkey"])
        if pd.notna(ck):
            lag[k] = last.get(int(ck))
            last[int(ck)] = r["o_orderdate"]
    rows = []
    for _, r in o.iterrows():
        k = int(r["o_orderkey"])
        ng, sg = grp[r["o_orderpriority"]]
        loo = float(sg - vd[k]) / (ng - 1) if ng > 1 else None
        pb = 1 + sum(cents[k] > e for e in edges)
        ck = r["o_custkey"]
        nc = int(ncust[ck]) if pd.notna(ck) else None
        dsp = None
        if pd.notna(ck) and lag.get(k) is not None:
            dsp = int((r["o_orderdate"].normalize()
                       - lag[k].normalize()).days)
        rows.append((k, loo, pb, nc, dsp))
    return pd.DataFrame(rows, columns=["o_orderkey", "prio_loo", "price_bin",
                                       "n_orders_cust", "days_since_prev"])


def _qcont(sorted_vals, ps):
    # quantile_cont / Spark percentile: pos = p*(n-1), linear interp
    out = []
    n = len(sorted_vals)
    for p in ps:
        pos = p * (n - 1)
        lo = int(pos)
        frac = pos - lo
        v = float(sorted_vals[lo])
        if frac > 0:
            v = v + (float(sorted_vals[lo + 1]) - v) * frac
        out.append(v)
    return out


def a1_count(sf):
    li = _t(sf, "lineitem", ["l_orderkey"])
    return pd.DataFrame({"n": [len(li)]})


def a2_count_distinct(sf):
    o = _t(sf, "orders", ["o_custkey"])
    return pd.DataFrame({"n_o_custkey": [int(o["o_custkey"].nunique())]})


def a5_group_mean_sort(sf):
    o = _t(sf, "orders", ["o_orderpriority", "o_totalprice"])
    o = o[o["o_orderpriority"].notna()]
    rows = [(g, exact_mean(s)) for g, s in
            o.groupby("o_orderpriority")["o_totalprice"]]
    return pd.DataFrame(rows, columns=["o_orderpriority", "avg_o_totalprice"])


def a6_rollup(sf):
    li = _t(sf, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    rows = []
    for (rf, ls), g in li.groupby(["l_returnflag", "l_linestatus"]):
        rows.append((rf, ls, len(g), _fsum(g["l_quantity"], Q10)))
    for rf, g in li.groupby("l_returnflag"):
        rows.append((rf, None, len(g), _fsum(g["l_quantity"], Q10)))
    rows.append((None, None, len(li), _fsum(li["l_quantity"], Q10)))
    return pd.DataFrame(rows, columns=["l_returnflag", "l_linestatus", "n",
                                       "sum_qty"])


def a7_conditional_agg(sf):
    li = _t(sf, "lineitem", ["l_returnflag", "l_extendedprice", "l_discount"])
    ret = li["l_returnflag"] == "R"
    return pd.DataFrame({
        "n_returned": [int(ret.sum())],
        "returned_value": [_fsum(
            [float(e) if r else 0.0
             for e, r in zip(li["l_extendedprice"], ret)], Q10)],
        "n_discounted": [int((li["l_discount"] > 0.05).sum())]})


def a8_pivot(sf):
    li = _t(sf, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    rows = []
    for rf, g in li.groupby("l_returnflag"):
        rows.append((rf,
                     _fsum(g[g["l_linestatus"] == "F"]["l_quantity"], Q10),
                     _fsum(g[g["l_linestatus"] == "O"]["l_quantity"], Q10)))
    return pd.DataFrame(rows, columns=["l_returnflag", "qty_f", "qty_o"])


def a9_above_avg(sf):
    li = _t(sf, "lineitem", ["l_extendedprice"])
    m = exact_mean(li["l_extendedprice"])
    return pd.DataFrame({"n_above": [int((li["l_extendedprice"] > m).sum())]})


def j1_join_inner(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    c = _t(sf, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    return m[["o_orderkey", "o_custkey", "o_totalprice", "c_name",
              "c_mktsegment"]]


def j1_join_3way(sf):
    c = _t(sf, "customer", ["c_custkey", "c_nationkey"])
    n = _t(sf, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    r = _t(sf, "region", ["r_regionkey", "r_name"])
    m = (c.merge(n, left_on="c_nationkey", right_on="n_nationkey")
         .merge(r, left_on="n_regionkey", right_on="r_regionkey"))
    return m[["c_custkey", "n_name", "r_name"]]


def j2_left_join(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    c = _t(sf, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    c = c[c["c_mktsegment"] == "BUILDING"][["c_custkey", "c_name"]]
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey", how="left")
    return m[["o_custkey", "o_orderkey", "o_totalprice", "c_name"]]


def j3_semi_anti(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_custkey"])
    c = _t(sf, "customer", ["c_custkey", "c_acctbal"])
    rich = set(c[c["c_acctbal"] > 5000]["c_custkey"].astype(int))
    inr = pd.Series([int(k) in rich for k in o["o_custkey"]], index=o.index)
    semi = o[inr].assign(which="semi")
    anti = o[~inr].assign(which="anti")
    return pd.concat([semi, anti])[["which", "o_orderkey", "o_custkey"]
                                   ].reset_index(drop=True)


def j4_salted_join(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    c = _t(sf, "customer", ["c_custkey", "c_mktsegment"])
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    return m[["o_custkey", "o_orderkey", "o_totalprice", "c_mktsegment"]]


def _range_join(sf, etype, mod, hours):
    ev = _t(sf, "events", ["event_id", "ts", "event_type"])
    iv = ev[(ev["event_type"] == etype) & (ev["event_id"] % mod == 0)]
    ivs = [(int(i), t, t + pd.Timedelta(hours=hours))
           for i, t in zip(iv["event_id"], iv["ts"])]
    rows = []
    for e_id, t, et in zip(ev["event_id"], ev["ts"], ev["event_type"]):
        for iid, lo, hi in ivs:
            if lo <= t <= hi:
                rows.append((iid, int(e_id), et))
    return pd.DataFrame(rows, columns=["interval_id", "event_id",
                                       "event_type"])


def j6_range_join(sf):
    return _range_join(sf, "signup", 40, 6)


def j8_range_auto(sf):
    return _range_join(sf, "purchase", 50, 4)


def j7_interval_overlap(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                          "o_orderpriority"])
    o = o[o["o_custkey"] < 200]
    wk = pd.Timedelta(days=7)
    a = [(int(k), d, d + wk) for k, d in
         zip(o[o["o_orderpriority"] == "1-URGENT"]["o_orderkey"],
             o[o["o_orderpriority"] == "1-URGENT"]["o_orderdate"])]
    b = [(int(k), d, d + wk) for k, d in
         zip(o[o["o_orderpriority"] == "2-HIGH"]["o_orderkey"],
             o[o["o_orderpriority"] == "2-HIGH"]["o_orderdate"])]
    rows = [(ak, bk) for ak, alo, ahi in a for bk, blo, bhi in b
            if alo <= bhi and blo <= ahi]
    return pd.DataFrame(rows, columns=["a_key", "b_key"])


def j9_basket_pairs(sf):
    li = _t(sf, "lineitem", ["l_orderkey", "l_partkey"]).drop_duplicates()
    from collections import Counter
    cnt = Counter()
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(int(p) for p in g["l_partkey"])
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                cnt[(parts[i], parts[j])] += 1
    rows = sorted(((a, b, n) for (a, b), n in cnt.items()),
                  key=lambda r: (-r[2], r[0], r[1]))[:50]
    return pd.DataFrame(rows, columns=["p_a", "p_b", "n_orders"])


def j10_dpp(sf):
    ev = _t(sf, "events", ["event_type"])
    g = ev.groupby("event_type").size()
    odd = g[g % 2 == 1]
    rows = [(t, int(n), int(n)) for t, n in odd.items()]
    return pd.DataFrame(rows, columns=["event_type", "n", "n_type"])


def j12_asof_tolerance(sf):
    ev = _t(sf, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    clicks = {}
    c = ev[ev["event_type"] == "click"]
    for u, g in c.groupby("user_id"):
        per = g.groupby("ts")["value"].max()
        clicks[int(u)] = sorted(per.items())
    import bisect
    rows = []
    p = ev[ev["event_type"] == "purchase"]
    tol = pd.Timedelta(seconds=1800)
    for u, t, i, v in zip(p["user_id"], p["ts"], p["event_id"], p["value"]):
        cv = None
        lst = clicks.get(int(u), [])
        k = bisect.bisect_right([x[0] for x in lst], t) - 1
        if k >= 0 and (t - lst[k][0]) <= tol:
            cv = float(lst[k][1])
        rows.append((int(u), t, int(i), float(v), cv))
    return pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "value",
                                       "click_value_tol"])


def o1_sort_desc(sf):
    return pd.read_parquet(f"{sf}/supplier.parquet")


def o2_sort_asc(sf):
    return pd.read_parquet(f"{sf}/customer.parquet")


def o3_topk(sf):
    li = _t(sf, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])
    m = li.sort_values(["l_extendedprice", "l_orderkey", "l_linenumber"],
                       ascending=[False, True, True]).head(10)
    return m[["l_orderkey", "l_linenumber", "l_extendedprice"]
             ].reset_index(drop=True)


def o4_topk_per_group(sf):
    li = _t(sf, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])
    rows = []
    for k, g in li.groupby("l_orderkey"):
        g = g.sort_values(["l_extendedprice", "l_linenumber"],
                          ascending=[False, True])
        for rk, (_, r) in enumerate(g.head(2).iterrows(), start=1):
            rows.append((int(k), int(r["l_linenumber"]),
                         float(r["l_extendedprice"]), rk))
    return pd.DataFrame(rows, columns=["l_orderkey", "l_linenumber",
                                       "l_extendedprice", "rk"])


def o5_window_analytics(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice",
                          "o_orderdate"])
    rows = []
    for ck, g in o.groupby("o_custkey"):
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        run = Decimal(0)
        prevp = None
        for _, r in g.iterrows():
            run += _dec(r["o_totalprice"], Q10)
            rows.append((int(r["o_orderkey"]), int(ck),
                         float(r["o_totalprice"]), prevp, float(run)))
            prevp = float(r["o_totalprice"])
    return pd.DataFrame(rows, columns=["o_orderkey", "o_custkey",
                                       "o_totalprice", "prev_price",
                                       "run_total"])


def o6_percentiles(sf):
    li = _t(sf, "lineitem", ["l_returnflag", "l_quantity"])
    rows = []
    for rf, g in li.groupby("l_returnflag"):
        q1, med, q3 = _qcont(sorted(float(v) for v in g["l_quantity"]),
                             (0.25, 0.5, 0.75))
        rows.append((rf, q1, med, q3))
    return pd.DataFrame(rows, columns=["l_returnflag", "q1", "median", "q3"])


def o7_rank_family(sf):
    o = _t(sf, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])
    rows = []
    for pr, g in o.groupby("o_orderpriority"):
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True])
        n = len(g)
        # SQL NTILE(4): first n%4 buckets get ceil(n/4) rows, rest floor
        q, rem = divmod(n, 4)
        boundary = rem * (q + 1)
        # order key (price desc, orderkey) is a total order: rank ==
        # dense_rank == row_number
        for rk, (_, r) in enumerate(g.iterrows(), start=1):
            if rk <= boundary:
                ntl = (rk - 1) // (q + 1) + 1
            else:
                ntl = rem + (rk - 1 - boundary) // q + 1
            rows.append((pr, int(r["o_orderkey"]), float(r["o_totalprice"]),
                         rk, rk,
                         (rk - 1) / (n - 1) if n > 1 else 0.0, rk / n, ntl))
    return pd.DataFrame(rows, columns=["o_orderpriority", "o_orderkey",
                                       "o_totalprice", "rnk", "drnk", "prnk",
                                       "cd", "quartile"])


def o8_window_frames(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice",
                          "o_orderdate"])
    rows = []
    for ck, g in o.groupby("o_custkey"):
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        vals = [float(v) for v in g["o_totalprice"]]
        keys = [int(k) for k in g["o_orderkey"]]
        for i in range(len(vals)):
            w3 = vals[max(0, i - 2):i + 1]
            mov = float(sum(_dec(v, Q10) for v in w3)) / len(w3)
            nxt = vals[i + 1] if i + 1 < len(vals) else None
            rows.append((keys[i], int(ck), vals[i], mov, nxt, vals[0]))
    return pd.DataFrame(rows, columns=["o_orderkey", "o_custkey",
                                       "o_totalprice", "mov_avg3",
                                       "next_price", "first_price"])


def u1_set_ops(sf):
    o = _t(sf, "orders", ["o_custkey", "o_orderpriority"])
    u = set(o[o["o_orderpriority"] == "1-URGENT"]["o_custkey"].astype(int))
    l = set(o[o["o_orderpriority"] == "5-LOW"]["o_custkey"].astype(int))
    rows = ([("intersect", k) for k in u & l]
            + [("except", k) for k in u - l]
            + [("union", k) for k in u | l])
    return pd.DataFrame(rows, columns=["which", "o_custkey"])


def u2_bag_ops(sf):
    from collections import Counter
    o = _t(sf, "orders", ["o_custkey", "o_orderpriority"])
    u = Counter(int(k) for k in
                o[o["o_orderpriority"] == "1-URGENT"]["o_custkey"])
    l = Counter(int(k) for k in
                o[o["o_orderpriority"] == "5-LOW"]["o_custkey"])
    rows = []
    for k, n in u.items():
        rows += [("except_all", k)] * max(0, n - l.get(k, 0))
        rows += [("intersect_all", k)] * min(n, l.get(k, 0))
    return pd.DataFrame(rows, columns=["which", "o_custkey"])


# ---- Scalar-function toolkits (F-tier) --------------------------------------
# Pure per-row string/date/JSON/math transforms; the replay IS the
# function's published definition (1-based positions, truncating lpad,
# HALF_UP decimal casts), recomputed from the parquet truth.


def f1_string_funcs(sf):
    c = _t(sf, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    rows = [(int(k), n.strip(), s.lower(), n.replace("#", "-"))
            for k, n, s in zip(c["c_custkey"], c["c_name"], c["c_mktsegment"])]
    return pd.DataFrame(rows, columns=["c_custkey", "name_trim",
                                       "seg_lower", "name_repl"])


def f2_f3_format(sf):
    o = _t(sf, "orders", ["o_totalprice"])
    n = len(o)
    m = exact_mean(o["o_totalprice"])
    d = Decimal(repr(m)).quantize(Decimal("0.001"), rounding=ROUND_HALF_UP)
    return pd.DataFrame({"n_fmt": [f"{n:,}"], "avg_fmt": [f"{d:,.3f}"]})


def f4_datetime(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_orderdate"])
    dt = pd.to_datetime(o["o_orderdate"])
    return pd.DataFrame({
        "o_orderkey": o["o_orderkey"].astype("int64"),
        "y": dt.dt.year.astype("int64"),
        "m": dt.dt.month.astype("int64"),
        "d": dt.dt.day.astype("int64"),
        "ym": dt.dt.strftime("%Y-%m"),
        "month_start": dt.values.astype("datetime64[M]"),
    })


def f5_json(sf):
    import json as _json
    ev = _t(sf, "events", ["event_id", "props"])
    rows = []
    for i, pr in zip(ev["event_id"], ev["props"]):
        k = None
        if pd.notna(pr):
            try:
                v = _json.loads(pr).get("k")
                k = int(v) if v is not None else None
            except (ValueError, TypeError):
                k = None
        rows.append((int(i), k))
    return pd.DataFrame(rows, columns=["event_id", "k"])


def f6_math_toolkit(sf):
    import math
    li = _t(sf, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey",
                             "l_quantity", "l_extendedprice"])
    q = li["l_quantity"].astype(float)
    e = li["l_extendedprice"].astype(float)
    return pd.DataFrame({
        "l_orderkey": li["l_orderkey"].astype("int64"),
        "l_linenumber": li["l_linenumber"].astype("int64"),
        "q_dev": (q - 25.0).abs(),
        "q_sign": [math.copysign(1.0, v) if v != 0.0 else 0.0
                   for v in (q - 25.0)],
        "price_sqrt": [math.sqrt(v) for v in e],
        "price_k_floor": [int(math.floor(v / 1000.0)) for v in e],
        "price_k_ceil": [int(math.ceil(v / 1000.0)) for v in e],
        "price_q": e * 0.25,
        "part_mod": (li["l_partkey"] % 97).astype("int64"),
    })


def f7_string_toolkit(sf):
    c = _t(sf, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    tr = str.maketrans("AEIOU", "aeiou")
    rows = []
    for k, n, s in zip(c["c_custkey"], c["c_name"], c["c_mktsegment"]):
        rows.append((int(k), n[:8], n[:4], n[-3:] if len(n) >= 3 else n,
                     s.rjust(12, ".")[:12] if len(s) <= 12 else s[:12],
                     n.find("#") + 1, s.translate(tr), s[::-1], s * 2,
                     len(n), s + "|" + n))
    return pd.DataFrame(rows, columns=[
        "c_custkey", "name8", "l4", "r3", "seg_pad", "hash_pos",
        "seg_tr", "seg_rev", "seg2", "name_len", "joined"])


def f8_null_toolkit(sf):
    c = _t(sf, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])
    rows = []
    for k, s, b in zip(c["c_custkey"], c["c_mktsegment"], c["c_acctbal"]):
        seg = None if (pd.isna(s) or s == "BUILDING") else s
        seg_red = seg if seg is not None else "(redacted)"
        if pd.isna(b):
            floor_b, cap_b, band = 0.0, 5000.0, "ok"
        else:
            b = float(b)
            floor_b, cap_b = max(b, 0.0), min(b, 5000.0)
            band = ("overdrawn" if b < 0 else "low" if b < 1000 else "ok")
        rows.append((int(k), seg_red, floor_b, cap_b, band))
    return pd.DataFrame(rows, columns=["c_custkey", "seg_red", "bal_floor",
                                       "bal_cap", "bal_band"])


# ---- Format round-trips and layout queries (S-tier) -------------------------
# The Spark side writes CSV/JSON/ORC/XML/partitioned/bucketed files and
# reads them back; the replay recomputes the EXPECTED result from the
# parquet truth alone — so the parity law checked here is exactly the
# driver's: any round-trip corruption diverges.


def _lpad_key(series, width):
    return [str(int(v)).rjust(width, "0") for v in series]


def s1_csv_roundtrip(sf):
    s = _t(sf, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    return pd.DataFrame({
        "supp_id": _lpad_key(s["s_suppkey"], 8), "s_name": s["s_name"],
        "s_nationkey": s["s_nationkey"].astype("int64"),
        "s_acctbal": s["s_acctbal"].astype(float)})


def s2_json_roundtrip(sf):
    n = _t(sf, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    return pd.DataFrame({
        "nation_id": _lpad_key(n["n_nationkey"], 4), "n_name": n["n_name"],
        "n_regionkey": n["n_regionkey"].astype("int64")})


def s3_orc_roundtrip(sf):
    p = _t(sf, "part", ["p_partkey", "p_name", "p_size", "p_retailprice"])
    return pd.DataFrame({
        "part_id": _lpad_key(p["p_partkey"], 9), "p_name": p["p_name"],
        "p_size": p["p_size"].astype("int64"),
        "p_retailprice": p["p_retailprice"].astype(float)})


def s13_xml_roundtrip(sf):
    s = _t(sf, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    return pd.DataFrame({
        "supp_id": _lpad_key(s["s_suppkey"], 7), "s_name": s["s_name"],
        "s_nationkey": s["s_nationkey"].astype("int64"),
        "s_acctbal": s["s_acctbal"].astype(float)})


def s7_cached_fanout(sf):
    li = _t(sf, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])
    rows = []
    for g, grp in li.groupby("l_returnflag"):
        rows.append(("avg_qty", g, exact_mean(grp["l_quantity"])))
        rows.append(("avg_disc", g, exact_mean(grp["l_discount"])))
    return pd.DataFrame(rows, columns=["which", "l_returnflag", "metric"])


def s9_partitioned_prune(sf):
    ev = _t(sf, "events", ["event_id", "user_id", "value", "event_type"])
    return ev[ev["event_type"].isin(["click", "purchase"])].reset_index(drop=True)


def s10_zorder(sf):
    import numpy as np
    li = _t(sf, "lineitem", ["l_partkey", "l_suppkey"])

    def spread(x):
        a = x & 65535
        b = (a | (a << 8)) & 16711935
        c = (b | (b << 4)) & 252645135
        d = (c | (c << 2)) & 858993459
        return (d | (d << 1)) & 1431655765

    p = li["l_partkey"].to_numpy(dtype="int64")
    s = li["l_suppkey"].to_numpy(dtype="int64")
    z = spread(p) | (spread(s) << 1)
    df = pd.DataFrame({"zbucket": z >> 16, "p": p, "s": s})
    g = df.groupby("zbucket").agg(
        n=("p", "size"), p_min=("p", "min"), p_max=("p", "max"),
        s_min=("s", "min"), s_max=("s", "max")).reset_index()
    return g


def s11_table_checksum(sf):
    import hashlib

    def md5i(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_orderstatus",
                          "o_totalprice", "o_orderdate", "o_orderpriority"])
    epoch = pd.Timestamp("1970-01-01")
    agg = {}
    for k, ck, st, tp, dt, pr in zip(
            o["o_orderkey"], o["o_custkey"], o["o_orderstatus"],
            o["o_totalprice"], pd.to_datetime(o["o_orderdate"]),
            o["o_orderpriority"]):
        import math
        us = int((dt - epoch).total_seconds()) * 1_000_000
        repr_ = (f"{int(k)}|{int(ck)}|{st}|"
                 f"{int(math.floor(float(tp) * 100))}|{us}|{pr}")
        b = md5i(str(int(k))) % 64
        n, c = agg.get(b, (0, 0))
        agg[b] = (n + 1, c + md5i(repr_))
    rows = [(b, n, c) for b, (n, c) in agg.items()]
    return pd.DataFrame(rows, columns=["bucket", "n_rows", "checksum"])


def s12_compact(sf):
    return _t(sf, "events", ["event_id", "user_id", "value", "event_type"])


def s17_schema_merge(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice",
                          "o_orderpriority"])
    pr = [p if int(k) % 2 == 1 else None
          for k, p in zip(o["o_orderkey"], o["o_orderpriority"])]
    return pd.DataFrame({
        "o_orderkey": o["o_orderkey"].astype("int64"),
        "o_custkey": o["o_custkey"].astype("int64"),
        "o_totalprice": o["o_totalprice"].astype(float),
        "o_orderpriority": pr})


def s18_bucketed_join(sf):
    import math
    li = _t(sf, "lineitem", ["l_orderkey", "l_extendedprice"])
    o = _t(sf, "orders", ["o_orderkey", "o_custkey"])
    li = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    li["cents_i"] = [int(math.floor(float(v) * 100))
                     for v in li["l_extendedprice"]]
    g = li.groupby("o_custkey").agg(
        n_items=("l_orderkey", "size"), cents=("cents_i", "sum")).reset_index()
    return g


# The 22 composed decision-support queries were the largest family
# still DuckDB-only. Same contract as every replay above: pandas for
# IO/joins, the money/mean arithmetic in exact Decimal/int — the
# house disciplines are
#   revenue  = float(sum(dec4(ext * (1.0 - disc))))   -- DECIMAL(28,4)
#   base sum = float(sum(dec2(v)))                    -- DECIMAL(28,2)
#   qty/avg  = float(sum(dec10(v))) [/ count]         -- DECIMAL(28,10)
# with dec<k> = Decimal(repr(float(v))).quantize(1e-k, HALF_UP), the
# Double.toString round-trip both engines share.

Q4 = Decimal(1).scaleb(-4)
Q2 = Decimal(1).scaleb(-2)


def _dec(v, q):
    return Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP)


def _dsum(vals, q):
    vals = [v for v in vals if pd.notna(v)]
    if not vals:
        return None
    return sum((_dec(v, q) for v in vals), Decimal(0))


def _fsum(vals, q):
    d = _dsum(vals, q)
    return None if d is None else float(d)


def _t(sf, name, cols):
    return pd.read_parquet(f"{sf}/{name}.parquet", columns=cols)


def _disc(df):
    return [float(e) * (1.0 - float(d))
            for e, d in zip(df["l_extendedprice"], df["l_discount"])]


def q1_pricing_summary(sf):
    li = _t(sf, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount", "l_shipdate"])
    li = li[li["l_shipdate"] <= pd.Timestamp("1999-12-01")]
    rows = []
    for (rf, ls), g in li.groupby(["l_returnflag", "l_linestatus"]):
        sq = _fsum(g["l_quantity"], Q10)
        rows.append((rf, ls, sq, _fsum(g["l_extendedprice"], Q2),
                     _fsum(_disc(g), Q4),
                     sq / int(g["l_quantity"].notna().sum()),
                     _fsum(g["l_discount"], Q10) / int(g["l_discount"].notna().sum()),
                     len(g)))
    return pd.DataFrame(rows, columns=[
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "avg_qty", "avg_disc", "count_order"])


def q2_min_cost_supplier(sf):
    li = _t(sf, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
    p = _t(sf, "part", ["p_partkey", "p_size", "p_type"])
    keep = set(p[(p["p_size"].between(20, 30)) & (p["p_type"] == "STANDARD")]
               ["p_partkey"].astype(int))
    ps = (li[[int(k) in keep for k in li["l_partkey"]]]
          .groupby(["l_partkey", "l_suppkey"])["l_extendedprice"]
          .min().reset_index(name="cost"))
    s = _t(sf, "supplier", ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])
    n = _t(sf, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    r = _t(sf, "region", ["r_regionkey", "r_name"])
    eur = (s.merge(n, left_on="s_nationkey", right_on="n_nationkey")
           .merge(r[r["r_name"] == "EUROPE"], left_on="n_regionkey",
                  right_on="r_regionkey"))
    m = ps.merge(eur, left_on="l_suppkey", right_on="s_suppkey")
    m["min_cost"] = m.groupby("l_partkey")["cost"].transform("min")
    m = m[m["cost"] == m["min_cost"]]
    m = m.rename(columns={"l_partkey": "p_partkey"})
    m = m.sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"],
                      ascending=[False, True, True, True]).head(100)
    return m[["s_acctbal", "s_name", "n_name", "p_partkey", "cost"]
             ].reset_index(drop=True)


def q3_shipping_priority(sf):
    li = _t(sf, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount",
                             "l_shipdate"])
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    c = _t(sf, "customer", ["c_custkey", "c_mktsegment"])
    m = (li[li["l_shipdate"] > pd.Timestamp("1998-01-01")]
         .merge(o[o["o_orderdate"] < pd.Timestamp("1998-01-01")],
                left_on="l_orderkey", right_on="o_orderkey")
         .merge(c[c["c_mktsegment"] == "BUILDING"],
                left_on="o_custkey", right_on="c_custkey"))
    rows = [(k, d, _fsum(_disc(g), Q4))
            for (k, d), g in m.groupby(["l_orderkey", "o_orderdate"])]
    out = pd.DataFrame(rows, columns=["l_orderkey", "o_orderdate", "revenue"])
    return (out.sort_values(["revenue", "l_orderkey"], ascending=[False, True])
            .head(10).reset_index(drop=True))


def q4_priority_exists(sf):
    o = _t(sf, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _t(sf, "lineitem", ["l_orderkey", "l_returnflag"])
    returned = set(li[li["l_returnflag"] == "R"]["l_orderkey"].astype(int))
    o = o[(o["o_orderdate"] >= pd.Timestamp("1996-07-01"))
          & (o["o_orderdate"] < pd.Timestamp("1996-10-01"))
          & pd.Series([int(k) in returned for k in o["o_orderkey"]],
                      index=o.index)]
    g = o.groupby("o_orderpriority").size().reset_index(name="order_count")
    return g.sort_values("o_orderpriority").reset_index(drop=True)


def q5_local_supplier(sf):
    c = _t(sf, "customer", ["c_custkey", "c_nationkey"])
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _t(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount"])
    s = _t(sf, "supplier", ["s_suppkey", "s_nationkey"])
    n = _t(sf, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    r = _t(sf, "region", ["r_regionkey", "r_name"])
    o = o[(o["o_orderdate"] >= pd.Timestamp("1997-01-01"))
          & (o["o_orderdate"] < pd.Timestamp("1998-01-01"))]
    m = (c.merge(o, left_on="c_custkey", right_on="o_custkey")
         .merge(li, left_on="o_orderkey", right_on="l_orderkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    m = m[m["c_nationkey"] == m["s_nationkey"]]
    m = (m.merge(n, left_on="s_nationkey", right_on="n_nationkey")
         .merge(r[r["r_name"] == "ASIA"], left_on="n_regionkey",
                right_on="r_regionkey"))
    rows = [(k, _fsum(_disc(g), Q4)) for k, g in m.groupby("n_name")]
    out = pd.DataFrame(rows, columns=["n_name", "revenue"])
    return (out.sort_values(["revenue", "n_name"], ascending=[False, True])
            .reset_index(drop=True))


def q6_forecast_revenue(sf):
    li = _t(sf, "lineitem", ["l_shipdate", "l_extendedprice", "l_discount",
                             "l_quantity"])
    li = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1997-01-01"))
            & (li["l_discount"] >= 0.05) & (li["l_discount"] <= 0.07)
            & (li["l_quantity"] < 24)]
    rev = _fsum([float(e) * float(d) for e, d in
                 zip(li["l_extendedprice"], li["l_discount"])], Q4)
    return pd.DataFrame({"revenue": [rev]})


def q7_volume_shipping(sf):
    na, nb = "NATION_1", "NATION_2"
    li = _t(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount", "l_shipdate"])
    li = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))].copy()
    li["l_year"] = [int(t.year) for t in li["l_shipdate"]]
    s = _t(sf, "supplier", ["s_suppkey", "s_nationkey"])
    c = _t(sf, "customer", ["c_custkey", "c_nationkey"])
    o = _t(sf, "orders", ["o_orderkey", "o_custkey"])
    n = _t(sf, "nation", ["n_nationkey", "n_name"])
    m = (li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
         .merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(n.rename(columns={"n_nationkey": "sk", "n_name": "supp_nation"}),
                left_on="s_nationkey", right_on="sk")
         .merge(n.rename(columns={"n_nationkey": "ck", "n_name": "cust_nation"}),
                left_on="c_nationkey", right_on="ck"))
    m = m[((m["supp_nation"] == na) & (m["cust_nation"] == nb))
          | ((m["supp_nation"] == nb) & (m["cust_nation"] == na))]
    rows = [(sn, cn, y, _fsum(_disc(g), Q4))
            for (sn, cn, y), g in m.groupby(["supp_nation", "cust_nation",
                                             "l_year"])]
    return pd.DataFrame(rows, columns=["supp_nation", "cust_nation", "l_year",
                                       "revenue"])


def q8_market_share(sf):
    li = _t(sf, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])
    p = _t(sf, "part", ["p_partkey", "p_type"])
    s = _t(sf, "supplier", ["s_suppkey", "s_nationkey"])
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    c = _t(sf, "customer", ["c_custkey", "c_nationkey"])
    n = _t(sf, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    r = _t(sf, "region", ["r_regionkey", "r_name"])
    o = o[(o["o_orderdate"] >= pd.Timestamp("1996-01-01"))
          & (o["o_orderdate"] < pd.Timestamp("1998-01-01"))]
    m = (li.merge(p[p["p_type"] == "ECONOMY"], left_on="l_partkey",
                  right_on="p_partkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey")
         .merge(n.rename(columns={"n_nationkey": "sk", "n_name": "nation",
                                  "n_regionkey": "sreg"}),
                left_on="s_nationkey", right_on="sk")
         .merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(n.rename(columns={"n_nationkey": "ck", "n_name": "cnat"}),
                left_on="c_nationkey", right_on="ck")
         .merge(r[r["r_name"] == "ASIA"], left_on="n_regionkey",
                right_on="r_regionkey"))
    m = m.copy()
    m["o_year"] = [int(t.year) for t in m["o_orderdate"]]
    rows = []
    for y, g in m.groupby("o_year"):
        num = _fsum(_disc(g[g["nation"] == "NATION_5"]), Q4)
        den = _fsum(_disc(g), Q4)
        rows.append((y, None if num is None else num / den))
    return pd.DataFrame(rows, columns=["o_year", "mkt_share"])


def q9_product_profit(sf):
    li = _t(sf, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])
    p = _t(sf, "part", ["p_partkey", "p_name"])
    s = _t(sf, "supplier", ["s_suppkey", "s_nationkey"])
    n = _t(sf, "nation", ["n_nationkey", "n_name"])
    o = _t(sf, "orders", ["o_orderkey", "o_orderdate"])
    m = (li.merge(p[[("gear" in str(x)) for x in p["p_name"]]],
                  left_on="l_partkey", right_on="p_partkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey")
         .merge(n, left_on="s_nationkey", right_on="n_nationkey")
         .merge(o, left_on="l_orderkey", right_on="o_orderkey")).copy()
    m["o_year"] = [int(t.year) for t in m["o_orderdate"]]
    rows = [(nn, y, _fsum(_disc(g), Q4))
            for (nn, y), g in m.groupby(["n_name", "o_year"])]
    return pd.DataFrame(rows, columns=["nation", "o_year", "sum_profit"])


def q10_returned_items(sf):
    c = _t(sf, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _t(sf, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount",
                             "l_returnflag"])
    n = _t(sf, "nation", ["n_nationkey", "n_name"])
    o = o[(o["o_orderdate"] >= pd.Timestamp("1996-01-01"))
          & (o["o_orderdate"] < pd.Timestamp("1996-04-01"))]
    m = (c.merge(o, left_on="c_custkey", right_on="o_custkey")
         .merge(li[li["l_returnflag"] == "R"], left_on="o_orderkey",
                right_on="l_orderkey")
         .merge(n, left_on="c_nationkey", right_on="n_nationkey"))
    rows = [(ck, cn, _fsum(_disc(g), Q4), ab, nn)
            for (ck, cn, ab, nn), g in m.groupby(["c_custkey", "c_name",
                                                  "c_acctbal", "n_name"])]
    out = pd.DataFrame(rows, columns=["c_custkey", "c_name", "revenue",
                                      "c_acctbal", "n_name"])
    return (out.sort_values(["revenue", "c_custkey"], ascending=[False, True])
            .head(20).reset_index(drop=True))


def q11_important_parts(sf):
    li = _t(sf, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice",
                             "l_discount"])
    s = _t(sf, "supplier", ["s_suppkey", "s_nationkey"])
    n = _t(sf, "nation", ["n_nationkey", "n_name"])
    m = (li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
         .merge(n[n["n_name"] == "NATION_1"], left_on="s_nationkey",
                right_on="n_nationkey"))
    vdec = {k: _dsum(_disc(g), Q4) for k, g in m.groupby("l_partkey")}
    thr = float(sum(vdec.values(), Decimal(0))) * 0.001
    rows = [(int(k), float(v)) for k, v in vdec.items() if float(v) > thr]
    out = pd.DataFrame(rows, columns=["l_partkey", "value"])
    return (out.sort_values(["value", "l_partkey"], ascending=[False, True])
            .reset_index(drop=True))


def q12_late_shipments(sf):
    li = _t(sf, "lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"])
    o = _t(sf, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    m = li[(li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
           & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))
           ].merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m = m[m["l_shipdate"] > m["o_orderdate"] + pd.Timedelta(days=60)]
    hi = {"1-URGENT", "2-HIGH"}
    rows = [(rf, int(sum(p in hi for p in g["o_orderpriority"])),
             int(sum(p not in hi for p in g["o_orderpriority"])))
            for rf, g in m.groupby("l_returnflag")]
    return pd.DataFrame(rows, columns=["l_returnflag", "high_line_count",
                                       "low_line_count"])


def q13_cust_distribution(sf):
    c = _t(sf, "customer", ["c_custkey"])
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_orderpriority"])
    o = o[o["o_orderpriority"] != "4-NOT SPECIFIED"]
    per = o.groupby("o_custkey").size().to_dict()
    counts = [int(per.get(int(k), 0)) for k in c["c_custkey"]]
    g = pd.Series(counts).value_counts().reset_index()
    g.columns = ["c_count", "custdist"]
    return (g.sort_values(["custdist", "c_count"], ascending=[False, False])
            .reset_index(drop=True))


def q14_promo_share(sf):
    li = _t(sf, "lineitem", ["l_partkey", "l_extendedprice", "l_discount",
                             "l_shipdate"])
    p = _t(sf, "part", ["p_partkey", "p_type"])
    li = li[(li["l_shipdate"] >= pd.Timestamp("1997-09-01"))
            & (li["l_shipdate"] < pd.Timestamp("1997-10-01"))]
    m = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    num = _fsum(_disc(m[m["p_type"] == "PROMO"]), Q4)
    den = _fsum(_disc(m), Q4)
    return pd.DataFrame({"promo_revenue": [100.0 * num / den]})


def q15_top_supplier(sf):
    li = _t(sf, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount",
                             "l_shipdate"])
    li = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1996-04-01"))]
    rev = {int(k): _fsum(_disc(g), Q4) for k, g in li.groupby("l_suppkey")}
    mx = max(rev.values())
    s = _t(sf, "supplier", ["s_suppkey", "s_name"])
    m = s[[rev.get(int(k)) == mx for k in s["s_suppkey"]]].copy()
    m["total_revenue"] = mx
    return (m[["s_suppkey", "s_name", "total_revenue"]]
            .sort_values("s_suppkey").reset_index(drop=True))


def q16_supplier_cnt(sf):
    li = _t(sf, "lineitem", ["l_partkey", "l_suppkey"])
    p = _t(sf, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    s = _t(sf, "supplier", ["s_suppkey", "s_acctbal"])
    bad = set(s[s["s_acctbal"] < 0]["s_suppkey"].astype(int))
    p = p[(p["p_brand"] != "Brand#1") & (p["p_type"] != "PROMO")
          & (p["p_size"].isin([1, 9, 14, 19, 23, 36, 45, 49]))]
    m = li[[int(k) not in bad for k in li["l_suppkey"]]
           ].merge(p, left_on="l_partkey", right_on="p_partkey")
    g = (m.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
         .nunique().reset_index(name="supplier_cnt"))
    return (g.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                          ascending=[False, True, True, True])
            .reset_index(drop=True))


def q17_small_qty_revenue(sf):
    li = _t(sf, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    p = _t(sf, "part", ["p_partkey", "p_brand"])
    thr = {int(k): 0.2 * (float(_dsum(g, Q10))
                          / int(g.notna().sum()))
           for k, g in li.groupby("l_partkey")["l_quantity"]}
    m = li.merge(p[p["p_brand"] == "Brand#3"], left_on="l_partkey",
                 right_on="p_partkey")
    m = m[[float(q) < thr[int(k)]
           for q, k in zip(m["l_quantity"], m["l_partkey"])]]
    return pd.DataFrame(
        {"avg_yearly": [_fsum(m["l_extendedprice"], Q2) / 7.0]})


def q18_large_orders(sf):
    li = _t(sf, "lineitem", ["l_orderkey", "l_quantity"])
    big = {int(k): float(_dsum(g, Q10))
           for k, g in li.groupby("l_orderkey")["l_quantity"]}
    big = {k: v for k, v in big.items() if v > 250.0}
    o = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                          "o_totalprice"])
    c = _t(sf, "customer", ["c_custkey", "c_name"])
    m = o[[int(k) in big for k in o["o_orderkey"]]
          ].merge(c, left_on="o_custkey", right_on="c_custkey").copy()
    m["sum_qty"] = [big[int(k)] for k in m["o_orderkey"]]
    m = m.sort_values(["o_totalprice", "o_orderkey"],
                      ascending=[False, True]).head(100)
    return m[["c_name", "o_custkey", "o_orderkey", "o_orderdate",
              "o_totalprice", "sum_qty"]].reset_index(drop=True)


def q19_disjunctive_rev(sf):
    li = _t(sf, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice",
                             "l_discount"])
    p = _t(sf, "part", ["p_partkey", "p_brand", "p_size"])
    m = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    keep = (((m["p_brand"] == "Brand#12") & m["p_size"].between(1, 15)
             & m["l_quantity"].between(1, 11))
            | ((m["p_brand"] == "Brand#23") & m["p_size"].between(1, 25)
               & m["l_quantity"].between(10, 20))
            | ((m["p_brand"] == "Brand#4") & m["p_size"].between(1, 35)
               & m["l_quantity"].between(20, 30)))
    return pd.DataFrame({"revenue": [_fsum(_disc(m[keep]), Q4)]})


def q20_excess_suppliers(sf):
    p = _t(sf, "part", ["p_partkey", "p_name"])
    sp = set(p[[str(x).startswith("small") for x in p["p_name"]]]
             ["p_partkey"].astype(int))
    li = _t(sf, "lineitem", ["l_partkey", "l_suppkey", "l_quantity",
                             "l_shipdate"])
    li = li[[int(k) in sp for k in li["l_partkey"]]]
    y95 = li[(li["l_shipdate"] >= pd.Timestamp("1995-01-01"))
             & (li["l_shipdate"] < pd.Timestamp("1996-01-01"))]
    y96 = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
             & (li["l_shipdate"] < pd.Timestamp("1997-01-01"))]
    avail = {k: _dsum(g, Q4)
             for k, g in y95.groupby(["l_partkey", "l_suppkey"])["l_quantity"]}
    shipped = {k: _dsum(g, Q4)
               for k, g in y96.groupby(["l_partkey", "l_suppkey"])["l_quantity"]}
    ok = {int(sk) for (pk, sk), av in avail.items()
          if (pk, sk) in shipped and 2 * av > shipped[(pk, sk)]}
    s = _t(sf, "supplier", ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])
    n = _t(sf, "nation", ["n_nationkey", "n_regionkey"])
    r = _t(sf, "region", ["r_regionkey", "r_name"])
    m = (s.merge(n, left_on="s_nationkey", right_on="n_nationkey")
         .merge(r[r["r_name"] == "ASIA"], left_on="n_regionkey",
                right_on="r_regionkey"))
    m = m[[int(k) in ok for k in m["s_suppkey"]]]
    return (m[["s_name", "s_acctbal"]].sort_values("s_name")
            .reset_index(drop=True))


def q21_lone_returner(sf):
    li = _t(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])
    o = _t(sf, "orders", ["o_orderkey", "o_orderstatus"])
    s = _t(sf, "supplier", ["s_suppkey", "s_name"])
    fo = set(o[o["o_orderstatus"] == "F"]["o_orderkey"].astype(int))
    supps = {}
    rsupps = {}
    for k, sk, rf in zip(li["l_orderkey"], li["l_suppkey"], li["l_returnflag"]):
        supps.setdefault(int(k), set()).add(int(sk))
        if rf == "R":
            rsupps.setdefault(int(k), set()).add(int(sk))
    l1 = li[(li["l_returnflag"] == "R")
            & pd.Series([int(k) in fo for k in li["l_orderkey"]],
                        index=li.index)]
    keep = [len(supps[int(k)] - {int(sk)}) > 0
            and len(rsupps.get(int(k), set()) - {int(sk)}) == 0
            for k, sk in zip(l1["l_orderkey"], l1["l_suppkey"])]
    m = l1[keep].merge(s, left_on="l_suppkey", right_on="s_suppkey")
    g = m.groupby("s_name").size().reset_index(name="numwait")
    return (g.sort_values(["numwait", "s_name"], ascending=[False, True])
            .head(100).reset_index(drop=True))


def q22_dormant_value(sf):
    c = _t(sf, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])
    o = _t(sf, "orders", ["o_custkey", "o_orderdate"])
    pos = c[c["c_acctbal"] > 0]["c_acctbal"]
    thr = float(_dsum(pos, Q10)) / int(pos.notna().sum())
    recent = set(o[o["o_orderdate"] >= pd.Timestamp("2000-06-01")]
                 ["o_custkey"].astype(int))
    m = c[(c["c_acctbal"] > thr)
          & pd.Series([int(k) not in recent for k in c["c_custkey"]],
                      index=c.index)]
    rows = [(seg, len(g), _fsum(g["c_acctbal"], Q2))
            for seg, g in m.groupby("c_mktsegment")]
    out = pd.DataFrame(rows, columns=["c_mktsegment", "numcust", "totacctbal"])
    return out.sort_values("c_mktsegment").reset_index(drop=True)


# ---- r16 closure: the five new gate rows -----------------------------------

def j21_chain_elim(sf):
    # snowflake-chain elimination may only change WHICH tables the plan
    # reads: the replay runs the REAL two-hop join
    import math
    o = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"])
    c = pd.read_parquet(f"{sf}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    n = pd.read_parquet(f"{sf}/nation.parquet", columns=["n_nationkey"])
    j = (o.merge(c, left_on="o_custkey", right_on="c_custkey", how="inner")
         .merge(n, left_on="c_nationkey", right_on="n_nationkey", how="inner"))
    j = j.assign(
        cents=[int(math.floor(float(v) * 100)) for v in j["o_totalprice"]])
    return (j.groupby("o_orderpriority")
            .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"))
            .reset_index())


def s50_ndv_rewrite(sf):
    # the exactness-gated sketch substitution must equal the TRUE
    # count(DISTINCT) per month — the replay computes it directly
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderdate", "o_custkey"])
    month = pd.to_datetime(o["o_orderdate"]).values.astype("datetime64[M]")
    seen = {}
    for m, ck in zip(month, o["o_custkey"]):
        seen.setdefault(m, set())
        if pd.notna(ck):
            seen[m].add(int(ck))
    rows = [(pd.Timestamp(m), len(s_)) for m, s_ in sorted(seen.items())]
    return pd.DataFrame(rows, columns=["month", "n_cust"])


def s51_ndv_metastore(sf):
    # quarter-grain true count(DISTINCT) — the reloaded definition's
    # answer must be the real thing
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderdate", "o_custkey"])
    ts = pd.to_datetime(o["o_orderdate"])
    quarter = ts.dt.to_period("Q").dt.start_time
    seen = {}
    for qd, ck in zip(quarter, o["o_custkey"]):
        seen.setdefault(qd, set())
        if pd.notna(ck):
            seen[qd].add(int(ck))
    rows = [(pd.Timestamp(m), len(s_)) for m, s_ in sorted(seen.items())]
    return pd.DataFrame(rows, columns=["quarter", "n_cust"])


def s52_bitmap_ndv(sf):
    # the bitmap rollup is EXACT by construction (it stores the ids);
    # the replay is the true per-month count(DISTINCT o_custkey)
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderdate", "o_custkey"])
    month = pd.to_datetime(o["o_orderdate"]).values.astype("datetime64[M]")
    seen = {}
    for m, ck in zip(month, o["o_custkey"]):
        seen.setdefault(m, set())
        if pd.notna(ck):
            seen[m].add(int(ck))
    rows = [(pd.Timestamp(m), len(s_)) for m, s_ in sorted(seen.items())]
    return pd.DataFrame(rows, columns=["month", "n_distinct"])


def s53_bitmap_rewrite(sf):
    # priority-grain true count(DISTINCT) — the grain where the KMV
    # definition must refuse and only the bitmap artifact answers
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderpriority", "o_custkey"])
    seen = {}
    for p_, ck in zip(o["o_orderpriority"], o["o_custkey"]):
        seen.setdefault(p_, set())
        if pd.notna(ck):
            seen[p_].add(int(ck))
    rows = [(p_, len(s_)) for p_, s_ in sorted(seen.items())]
    return pd.DataFrame(rows, columns=["prio", "n_cust"])


def a28_segment_overlap(sf):
    # exact pairwise segment overlap replayed with raw python sets —
    # the same quantity the engine reads off two compressed bitmaps
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderpriority", "o_custkey"])
    segs = {}
    for p_, ck in zip(o["o_orderpriority"], o["o_custkey"]):
        segs.setdefault(p_, set())
        if pd.notna(ck):
            segs[p_].add(int(ck))
    names = sorted(segs)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            na, nb = len(segs[a]), len(segs[b])
            common = len(segs[a] & segs[b])
            rows.append((a, b, na, nb, common, na + nb - common))
    return pd.DataFrame(
        rows, columns=["seg_a", "seg_b", "n_a", "n_b", "n_common", "n_union"])


def s54_fd_prune(sf):
    # the FD prune may only change the GROUPING KEY WIDTH, never a
    # value: the replay runs the real wide grouping
    import math
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{sf}/customer.parquet",
                        columns=["c_custkey", "c_name", "c_mktsegment"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey", how="inner")
    j = j.assign(
        cents=[int(math.floor(float(v) * 100)) for v in j["o_totalprice"]])
    out = (j.groupby(["c_custkey", "c_name", "c_mktsegment"])
           .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"))
           .reset_index())
    return out


def s55_bitmap_coarsen(sf):
    # one fine-grained bitmap rollup answers every coarser grain; the
    # replay computes both tiles directly from the fact
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderpriority", "o_custkey"])
    seen = {}
    allc = set()
    for p_, ck in zip(o["o_orderpriority"], o["o_custkey"]):
        seen.setdefault(p_, set())
        if pd.notna(ck):
            seen[p_].add(int(ck))
            allc.add(int(ck))
    rows = [(p_, len(s_), len(allc)) for p_, s_ in sorted(seen.items())]
    return pd.DataFrame(rows, columns=["prio", "n_cust", "n_total"])


def e1_suffix_spans(sf, L=32, sliced=False):
    # char-granular duplicated spans replayed by direct substring
    # counting (no ranks, no doubling): every length-L window,
    # corpus-wide occurrence counts, gaps-and-islands per doc.
    # sliced=True replays the detection gate's deterministic prefix
    # third (doc_id*3 < corpus row count — integer arithmetic).
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    if sliced:
        n = len(d)
        d = d[d["doc_id"] * 3 < n]
    wins = []
    for i, t in zip(d["doc_id"], d["text"]):
        if t is None:
            continue
        for p in range(0, len(t) - L + 1):
            wins.append((int(i), p, t[p:p + L]))
    counts = {}
    for _, _, w in wins:
        counts[w] = counts.get(w, 0) + 1
    dup = {}
    for i, p, w in wins:
        if counts[w] >= 2:
            dup.setdefault(i, []).append(p)
    rows = []
    for i, ps in dup.items():
        ps.sort()
        start = prev = ps[0]
        for p in ps[1:] + [None]:
            if p is not None and p == prev + 1:
                prev = p
                continue
            rows.append((i, start, prev + L - 1, prev + L - start))
            if p is not None:
                start = prev = p
    return pd.DataFrame(
        rows, columns=["doc_id", "span_start", "span_end", "span_len"])


def e1_span_scrub(sf, L=32):
    # ExactSubstr scrub: union-merge each doc's duplicated spans
    # (adjacent intervals merged too), excise every covered char,
    # rebuild the doc from its inter-cut gaps
    spans = e1_suffix_spans(sf, L)
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    by_doc = {}
    for i, s, e in zip(spans["doc_id"], spans["span_start"], spans["span_end"]):
        by_doc.setdefault(int(i), []).append((int(s), int(e)))
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        i = int(i)
        ivs = sorted(by_doc.get(i, []))
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        kept, nxt = [], 0
        for s, e in merged:
            kept.append(t[nxt:s])
            nxt = e + 1
        kept.append(t[nxt:])
        rows.append((i, len(merged), sum(e - s + 1 for s, e in merged),
                     "".join(kept)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_cuts", "n_cut_chars", "clean_text"])


# ---- r18: URL canonicalization / link graph / host rank ---------------------

_TRACKING_RE = r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)="


def _canon_url(u):
    import re as _re
    u = _re.sub(r"#.*$", "", u)
    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", u)
    scheme = m.group(1).lower() if m else ""
    m = _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", u)
    hp = (m.group(1) if m else "").lower()
    if scheme == "http":
        hp = _re.sub(r":80$", "", hp)
    elif scheme == "https":
        hp = _re.sub(r":443$", "", hp)
    m = _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", u)
    path = _re.sub(r"/+$", "", m.group(1) if m else "")
    if path == "":
        path = "/"
    m = _re.search(r"\?([^#]*)", u)
    q = m.group(1) if m else ""
    kept = sorted(p for p in q.split("&")
                  if p and not _re.match(_TRACKING_RE, p))
    return scheme + "://" + hp + path + ("?" + "&".join(kept) if kept else "")


def _url_host(canon):
    import re as _re
    m = _re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]*)", canon)
    return m.group(1) if m else ""


def _url_wrap(i):
    m = int(i) % 60
    scheme = ["http", "HTTPS", "Http", "https"][m % 4]
    host = ["Example.COM", "www.example.com", "EXAMPLE.com",
            "docs.Example.org", "example.com"][m % 5]
    port = {0: ":80", 1: ":443", 2: ":8080"}.get(m % 6, "")
    path = "/Docs/item%d" % (m % 10) + ("/" if m % 2 == 0 else "")
    a = m % 5
    q = ["?utm_source=feed&z=9&a=%d" % a,
         "?b=2&utm_campaign=Spring&a=%d" % a,
         "?a=%d&gclid=g123&b=2" % a][m % 3]
    frag = "#sec%d" % (m % 7) if m % 6 == 0 else ""
    return scheme + "://" + host + port + path + q + frag


def e5_url_canon(sf):
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    rows = [(int(i), _url_wrap(i), _canon_url(_url_wrap(i)))
            for i in d["doc_id"]]
    return pd.DataFrame(rows, columns=["doc_id", "url", "canon_url"])


def e1_url_dedup(sf):
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    groups = {}
    for i in d["doc_id"]:
        c = _canon_url(_url_wrap(i))
        kept, n = groups.get(c, (None, 0))
        groups[c] = (int(i) if kept is None else min(kept, int(i)), n + 1)
    return pd.DataFrame(
        [(c, kept, n) for c, (kept, n) in groups.items()],
        columns=["canon_url", "kept_doc", "n_docs"])


def _outlink_page(i, t):
    i = int(i)
    return (
        '<html><body><nav><a href="/">home</a> '
        '<a href="/about">about</a></nav><p>%s</p>'
        '<p>see <a href="HTTPS://H%d.Example.NET:443/r%d/">one</a>, '
        '<a href="http://h%d.example.net/s?utm_source=feed&q=%d">two</a> '
        'and <a href="Http://h%d.Example.NET:8080/t#frag">three</a></p>'
        '</body></html>'
    ) % (t, (i * 7 + 11) % 23, i % 7, (i * 13 + 5) % 23, i % 7,
         (i * 3 + 2) % 23)


def _extract_links(page):
    import re as _re
    return _re.findall(r'href="([A-Za-z][A-Za-z0-9+.-]*://[^"]+)"', page)


def e5_link_extract(sf):
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        for u in _extract_links(_outlink_page(i, t)):
            c = _canon_url(u)
            rows.append((int(i), u, c, _url_host(c)))
    return pd.DataFrame(
        rows, columns=["doc_id", "link_url", "canon_url", "link_host"])


def e6_host_quality(sf):
    # the rank signal consumed: every doc joined to its canonical
    # authority's PageRank (produce-then-consume, one composition)
    rank = {h: p for h, p in
            zip(*(lambda df: (df["host"], df["pr"]))(e2_host_rank(sf)))}
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    rows = [(int(i), _url_host(_canon_url(_url_wrap(i))))
            for i in d["doc_id"]]
    return pd.DataFrame(
        [(i, h, rank[h]) for i, h in rows if h in rank],
        columns=["doc_id", "src_host", "host_pr"])


def e7_rank_weighted(sf):
    # produce -> consume -> SAMPLE: per-host keep-rate derived from
    # the PageRank (250 + floor(pr/pr_max*750), clamped to 1000
    # permille), each doc kept iff md5("rankmix_"+id) % 1000 falls
    # under its host's rate
    import math
    df = e2_host_rank(sf)
    pr_max = max(df["pr"])
    rate = {h: min(1000, 250 + int(math.floor((p / pr_max) * 750.0)))
            for h, p in zip(df["host"], df["pr"])}
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])
    rows = []
    for i in d["doc_id"]:
        h = _url_host(_canon_url(_url_wrap(i)))
        if h in rate and _md5i(f"rankmix_{int(i)}") % 1000 < rate[h]:
            rows.append((int(i), h, rate[h]))
    return pd.DataFrame(rows, columns=["doc_id", "src_host", "keep_rate"])


def e2_host_rank(sf, iters=3):
    # weighted directed PageRank over the canonical host graph,
    # replayed with the engine's arithmetic contract: per-edge double
    # (pr / wout) * w in that op order, DECIMAL(28,10) sums, double
    # teleport; no dangling redistribution
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    edges = {}
    hosts = set()
    for i, t in zip(d["doc_id"], d["text"]):
        src = _url_host(_canon_url(_url_wrap(i)))
        hosts.add(src)
        for u in _extract_links(_outlink_page(i, t)):
            dst = _url_host(_canon_url(u))
            hosts.add(dst)
            edges[(src, dst)] = edges.get((src, dst), 0) + 1
    wout = {}
    for (s, _), w in edges.items():
        wout[s] = wout.get(s, 0) + w
    n = len(hosts)
    pr = {h: 1.0 / n for h in hosts}
    for _ in range(iters):
        sums = {}
        for (s, t), w in edges.items():
            cd = dec10((pr[s] / float(wout[s])) * float(w))
            sums[t] = sums.get(t, Decimal(0)) + cd
        pr = {h: 0.15 / n + (0.85 * float(sums[h]) if h in sums else 0.0)
              for h in hosts}
    return pd.DataFrame(sorted(pr.items()), columns=["host", "pr"])


def e5_line_dedup(sf):
    # deterministic page wrap (nav x3, footer x2, unique header,
    # 8-token content lines) + first-occurrence line filter
    import re
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    nav, ftr = "home | tags | about | feed", "copyright example corp"
    rows = []
    for i, t in zip(d["doc_id"], d["text"]):
        tks = [w for w in re.split(r"\s+", str(t).strip())]
        content = [" ".join(tks[j * 8:j * 8 + 8])
                   for j in range((len(tks) + 7) // 8)]
        lines = [nav, f"doc {int(i)} - reader view"] + content + [nav, ftr, nav, ftr]
        kept = [l for j, l in enumerate(lines) if lines.index(l) == j]
        rows.append((int(i), len(lines), len(lines) - len(kept),
                     "\n".join(kept)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_lines", "n_dupes", "clean_text"])


def e3_graph_search(sf, rounds=3, beam=8, k=3, n_queries=32):
    # beam search replayed over the identically-derived mutual graph:
    # enter at the query node, expand via edges, score fresh candidates
    # by exact cosine, per-round top-beam, final top-k of the pool
    import math
    edges = e3_knn_graph(sf)
    adj = {}
    for a, b in zip(edges["id_a"], edges["id_b"]):
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    e = pd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = {int(v): [float(x) for x in a]
           for v, a in zip(e["vec_id"], e["embedding"])}
    n2 = {i: _dot(v, v) for i, v in emb.items()}
    rows = []
    for q in sorted(emb):
        if q >= n_queries:
            continue
        seen = {q}
        frontier = [q]
        pool = []
        for _ in range(rounds):
            cands = sorted({c for f in frontier for c in adj.get(f, [])} - seen)
            if not cands:
                break
            scored = sorted(
                ((_dot(emb[q], emb[c]) /
                  (math.sqrt(n2[q]) * math.sqrt(n2[c])), c) for c in cands),
                key=lambda t: (-t[0], t[1]))[:beam]
            seen.update(c for _, c in scored)
            frontier = [c for _, c in scored]
            pool.extend(scored)
        top = sorted(pool, key=lambda t: (-t[0], t[1]))[:k]
        rows.extend((q, c, cs, rk)
                    for rk, (cs, c) in enumerate(top, start=1))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim", "rk"])


def _kcenter_ids(emb, n2, ids, k):
    # Gonzalez farthest-point-first picks (the e3_kcenter replay,
    # ids only): seed = lowest id, then k-1 rounds of running-min
    # distance fold + (dist desc, id asc) argmax
    import math
    seed = min(ids)
    chosen = [seed]
    md = {}
    for _ in range(2, k + 1):
        c = chosen[-1]
        for i in ids:
            d = 1.0 - _dot(emb[i], emb[c]) / (math.sqrt(n2[i]) * math.sqrt(n2[c]))
            md[i] = d if i not in md else min(md[i], d)
        taken = set(chosen)
        cand = [(md[i], i) for i in ids if i not in taken]
        best = max(cand, key=lambda t: (t[0], -t[1]))
        chosen.append(best[1])
    return sorted(chosen)


def e3_graph_search_external(sf, rounds=3, beam=8, k=3,
                             n_queries=32, entry_k=4):
    # external-query variant: graph over a deterministic THIRD of the
    # held-out corpus (vec_id % 10 != 0 and % 3 == 1 — the r18 bounded
    # composition gate), each query (vec_id % 10 == 0) seeded at its
    # top-entry_k STORED LANDMARKS (k-center picks over the corpus,
    # the trained entry table the index ships) by exact cosine;
    # entries are scored as layer 0, then the member-variant walk
    import math
    from collections import Counter
    e = pd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = {int(v): [float(x) for x in a]
           for v, a in zip(e["vec_id"], e["embedding"])}
    n2 = {i: _dot(v, v) for i, v in emb.items()}
    corpus = {i for i in emb if i % 10 != 0 and i % 3 == 1}
    buckets = {}
    for i in sorted(corpus):
        v = emb[i]
        key = "".join("1" if x >= 0 else "0" for x in v[:6]).ljust(6, "0")
        buckets.setdefault(key, []).append(i)
    directed = []
    for members in buckets.values():
        for q in members:
            scored = sorted(
                ((c, _dot(emb[q], emb[c]) /
                  (math.sqrt(n2[q]) * math.sqrt(n2[c])))
                 for c in members if c != q),
                key=lambda t: (-t[1], t[0]))[:3]
            directed.extend((q, c) for c, _ in scored)
    dirs = Counter()
    for q, c in directed:
        dirs[(min(q, c), max(q, c))] += 1
    adj = {}
    for (a, b), n in dirs.items():
        if n == 2:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
    landmarks = _kcenter_ids(emb, n2, sorted(corpus), 6)

    def cosv(a, b):
        return _dot(emb[a], emb[b]) / (math.sqrt(n2[a]) * math.sqrt(n2[b]))

    rows = []
    for q in sorted(emb):
        if q % 10 != 0 or q >= n_queries * 10:
            continue
        ent = sorted(((cosv(q, l), l) for l in landmarks),
                     key=lambda t: (-t[0], t[1]))[:entry_k]
        seen = {c for _, c in ent}
        pool = list(ent)  # layer 0: entries are candidates
        frontier = [c for _, c in sorted(ent, key=lambda t: (-t[0], t[1]))[:beam]]
        for _ in range(rounds):
            cands = sorted({c for f in frontier for c in adj.get(f, [])} - seen)
            if not cands:
                break
            scored = sorted(((cosv(q, c), c) for c in cands),
                            key=lambda t: (-t[0], t[1]))[:beam]
            seen.update(c for _, c in scored)
            frontier = [c for _, c in scored]
            pool.extend(scored)
        top = sorted(pool, key=lambda t: (-t[0], t[1]))[:k]
        rows.extend((q, c, cs, rk)
                    for rk, (cs, c) in enumerate(top, start=1))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim", "rk"])


def e3_graph_search_ext_saved(sf, rounds=3, beam=8, k=3,
                              n_queries=32, entry_k=4):
    # turnkey saved-artifact probe: graph AND landmarks are the
    # standing full-corpus index; member queries (vec_id < n_queries)
    # enter ONLY through the stored k-center landmarks (self-pair
    # skipped in entry scoring), never own-node seeding
    import math
    from collections import Counter
    e = pd.read_parquet(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emb = {int(v): [float(x) for x in a]
           for v, a in zip(e["vec_id"], e["embedding"])}
    n2 = {i: _dot(v, v) for i, v in emb.items()}
    buckets = {}
    for i in sorted(emb):
        v = emb[i]
        key = "".join("1" if x >= 0 else "0" for x in v[:6]).ljust(6, "0")
        buckets.setdefault(key, []).append(i)
    directed = []
    for members in buckets.values():
        for q in members:
            scored = sorted(
                ((c, _dot(emb[q], emb[c]) /
                  (math.sqrt(n2[q]) * math.sqrt(n2[c])))
                 for c in members if c != q),
                key=lambda t: (-t[1], t[0]))[:3]
            directed.extend((q, c) for c, _ in scored)
    dirs = Counter()
    for q, c in directed:
        dirs[(min(q, c), max(q, c))] += 1
    adj = {}
    for (a, b), n in dirs.items():
        if n == 2:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
    landmarks = _kcenter_ids(emb, n2, sorted(emb), 6)

    def cosv(a, b):
        return _dot(emb[a], emb[b]) / (math.sqrt(n2[a]) * math.sqrt(n2[b]))

    rows = []
    for q in sorted(emb):
        if q >= n_queries:
            continue
        ent = sorted(((cosv(q, l), l) for l in landmarks if l != q),
                     key=lambda t: (-t[0], t[1]))[:entry_k]
        seen = {c for _, c in ent}
        pool = list(ent)  # layer 0: entries are candidates
        frontier = [c for _, c in sorted(ent, key=lambda t: (-t[0], t[1]))[:beam]]
        for _ in range(rounds):
            cands = sorted({c for f in frontier for c in adj.get(f, [])} - seen)
            if not cands:
                break
            scored = sorted(((cosv(q, c), c) for c in cands),
                            key=lambda t: (-t[0], t[1]))[:beam]
            seen.update(c for _, c in scored)
            frontier = [c for _, c in scored]
            pool.extend(scored)
        top = sorted(pool, key=lambda t: (-t[0], t[1]))[:k]
        rows.extend((q, c, cs, rk)
                    for rk, (cs, c) in enumerate(top, start=1))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim", "rk"])


def e3_graph_search_adc(sf, rounds=3, beam=8, k=3, n_queries=32, train=None):
    # ADC-scored walk with exact re-rank: in-loop scores come from the
    # PQ codebook replay (fixed left-assoc subspace sum), the final
    # pool re-ranks by exact cosine — composing the two proven replays.
    # `train` replays the gate's deterministic codebook-training slice
    # (the _saved twin trains on the full corpus, train=None).
    import math
    parts = _pq_parts(sf, train)

    def adc(q, c):
        total, first = 0.0, True
        for i in range(4):
            sub, codes, cents = parts[i]
            p = _dot(sub[q], cents[codes[c]][0])
            total = p if first else total + p
            first = False
        return total

    edges = e3_knn_graph(sf)
    adj = {}
    for a, b in zip(edges["id_a"], edges["id_b"]):
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    emb, n2 = _load_emb(sf)
    rows = []
    for q in sorted(emb):
        if q >= n_queries:
            continue
        seen = {q}
        frontier = [q]
        pool = []
        for _ in range(rounds):
            cands = sorted({c for f in frontier for c in adj.get(f, [])} - seen)
            if not cands:
                break
            scored = sorted(((adc(q, c), c) for c in cands),
                            key=lambda t: (-t[0], t[1]))[:beam]
            seen.update(c for _, c in scored)
            frontier = [c for _, c in scored]
            pool.extend(c for _, c in scored)
        rer = sorted(
            ((_dot(emb[q], emb[c]) / (math.sqrt(n2[q]) * math.sqrt(n2[c])), c)
             for c in pool), key=lambda t: (-t[0], t[1]))[:k]
        rows.extend((q, c, cs, rk) for rk, (cs, c) in enumerate(rer, start=1))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cos_sim", "rk"])


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_priority_exists": q4_priority_exists,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q11_important_parts": q11_important_parts,
    "q12_late_shipments": q12_late_shipments,
    "q13_cust_distribution": q13_cust_distribution,
    "q14_promo_share": q14_promo_share,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_cnt": q16_supplier_cnt,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_rev": q19_disjunctive_rev,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_lone_returner": q21_lone_returner,
    "q22_dormant_value": q22_dormant_value,
    "a3_mean": a3_mean,
    "w9_dedup_stream": w9_dedup_stream,
    "w1_window_stream": w1_window_agg,
    "w5_funnel_stream": w5_funnel,
    "s19_rollup_stream": s19_rollup_incremental,
    "s27_bloom_skip": s27_bloom_skip,
    "s28_compound_skip": s28_compound_skip,
    "e8_decontaminated": e8_decontaminated,
    "j5_asof_join": j5_asof_join,
    "j5_asof_native": j5_asof_join,
    "j5_asof_stream": j5_asof_join,
    "j5_asof_bounded_stream": j5_asof_bounded,
    "w6_retention": w6_retention,
    "w7_twap": w7_twap,
    "w8_interval_merge": w8_interval_merge,
    "w10_ohlc": w10_ohlc,
    "w10_ohlc_stream": w10_ohlc,
    "e7_split": e7_split,
    "e6_full_prep": e6_full_prep,
    "e2_dedup_clusters": e2_dedup_clusters,
    "e2_cluster_rep": e2_cluster_rep,
    "e1_dedup_exact": e1_dedup_exact,
    "e1_passage_dedup": e1_passage_dedup,
    "e5_token_stats": e5_token_stats,
    "e5_word_freq": e5_word_freq,
    "e5_char_trigrams": e5_char_trigrams,
    "e5_fingerprint": e5_fingerprint,
    "e5_repetition": e5_repetition,
    "e7_mixture_stats": e7_mixture_stats,
    "e7_temperature": e7_temperature,
    "a23_cms_frequency": a23_cms_frequency,
    "a23_cms_stream": a23_cms_stream,
    "a24_cusum_drift": a24_cusum_drift,
    "a24_cusum_stream": a24_cusum_stream,
    "w3_session_window": w3_session_window,
    "w3_session_stream": w3_session_window,
    "w4_hopping_window": w4_hopping,
    "w4_hopping_stream": w4_hopping,
    "a19_drift_stream": a19_drift_stream,
    "e8_decontam_stream": e8_decontaminated,
    "e5_quality_classifier": e5_quality_classifier,
    "e5_quality_stream": e5_quality_classifier,
    "a21_chi_drift": a21_chi_drift,
    "a18_heavy_hitters": a18_heavy_hitters,
    "s14_scd2": s14_scd2,
    "s20_snapshot_read": s20_snapshot_read,
    "w2_sessionize": w2_sessionize,
    "o9_moving_median": o9_moving_median,
    "o11_ewma": o11_ewma,
    "o13_pareto": o13_pareto,
    "o10_gap_fill": o10_gap_fill,
    "o12_cumulative_users": o12_cumulative_users,
    "o14_transitions": o14_transitions,
    "a12_cube": a12_cube,
    "a17_grouping_id": a17_grouping_id,
    "p7_winsorize": p7_winsorize,
    "a16_mode": a16_mode,
    "a11_histogram": a11_histogram,
    "a22_mad_outliers": a22_mad_outliers,
    "e5_bm25": e5_bm25,
    "e5_bm25_saved": e5_bm25,
    "e5_bm25_appended": e5_bm25,
    "e5_bm25_compacted": e5_bm25,
    "a10_corr": a10_corr,
    "a14_group_regression": a14_group_regression,
    "a26_corr_matrix": a26_corr_matrix,
    "p9_target_encode": p9_target_encode,
    "e3_cosine_topk": e3_cosine_topk,
    "e3_filtered_topk": e3_filtered_topk,
    "e3_cosine_sql": e3_cosine_topk,
    "e2_simhash_pairs": e2_simhash_pairs,
    "e2_triangles": e2_triangles,
    "e2_minhash_pairs": e2_minhash_pairs,
    "e2_ngram_jaccard": e2_ngram_jaccard,
    "e2_containment": e2_containment,
    "e2_lev_verify": e2_lev_verify,
    "e2_dedup_impact": e2_dedup_impact,
    "e2_embed_neardup": e2_embed_neardup,
    "e2_semantic_dedup": e2_semantic_dedup,
    "e5_pii_redact": e5_pii_redact,
    "e2_neardup_saved": e2_minhash_pairs,
    "e3_knn_graph": e3_knn_graph,
    "e3_ann_bucketed": e3_ann_bucketed,
    "s8_upsert": s8_upsert,
    "e3_ivf_topk": e3_ivf_topk,
    "e3_sq8_topk": e3_sq8_topk,
    "e7_reservoir": e7_reservoir,
    "e7_priority_sample": e7_priority_sample,
    "e1_source_overlap": e1_source_overlap,
    "e1_span_dedup": e1_span_dedup,
    "e1_span_maximal": e1_span_maximal,
    "e6_corpus_clean": e6_corpus_clean,
    "e5_html_extract": e5_html_extract,
    "e5_normalize": e5_normalize,
    "e5_lm_score": e5_lm_score,
    "e5_tfidf": e5_tfidf,
    "e7_token_budget": e7_token_budget,
    "e7_curriculum": e7_curriculum,
    "e7_cluster_split": e7_cluster_split,
    "e8_contamination": e8_contamination,
    "e5_bpe_train": e5_bpe_train,
    "e5_unigram_train": e5_unigram_train,
    "e5_unigram_apply": e5_unigram_apply,
    "e5_unigram_saved": e5_unigram_apply,
    "e5_unigram_stream": e5_unigram_apply,
    "e5_lid_model": e5_lid_model,
    "e5_lid_saved": e5_lid_model,
    "e5_lid_confusion": e5_lid_confusion,
    "e5_quality_langid": e5_quality_langid,
    "e5_chunks": e5_chunks,
    "e5_domain_select": e5_domain_select,
    "e5_bigram_rarity": e5_bigram_rarity,
    "e6_ppl_buckets": e6_ppl_buckets,
    "e2_chain_components": e2_chain_components,
    "e2_lsh_scurve": e2_lsh_scurve,
    "e2_pagerank_rep": e2_pagerank_rep,
    "e4_blob_meta": e4_blob_meta,
    "e4_dim_stats": e4_dim_stats,
    "e4_decode_stats": e4_decode_stats,
    "e4_resize_stats": e4_resize_stats,
    "e4_image_dedup": e4_image_dedup,
    "e4_scene_cuts": e4_scene_cuts,
    "e4_audio_stats": e4_audio_stats,
    "e4_video_frames": e4_video_frames,
    "e4_embedding_stats": e4_embedding_stats,
    "e6_data_card": e6_data_card,
    "e3_ivf_learned": e3_ivf_learned,
    "e3_ivf_saved": e3_ivf_learned,
    "e3_ivf_incremental": e3_ivf_incremental,
    "e3_ivf_compacted": e3_ivf_incremental,
    "e3_ivf_stream": e3_ivf_incremental,
    "e3_sq8_saved": e3_sq8_topk,
    "e3_ann_recall": e3_ann_recall,
    "e3_pq_codes": e3_pq_codes,
    "e3_hybrid_rrf": e3_hybrid_rrf,
    "e3_pq_adc": e3_pq_adc,
    "e3_pq_saved": e3_pq_adc,
    "e3_pq_incremental": e3_pq_incremental,
    "e3_sq8_incremental":
        (lambda sf: e3_sq8_topk(sf, train=lambda i: i % 7 != 3)),
    "e3_sq8_recall": e3_sq8_recall,
    "e3_ivf_probe": e3_ivf_probe,
    "e3_ivf_recall_probe": e3_ivf_recall_probe,
    "e3_hard_negatives": e3_hard_negatives,
    "e5_pack": e5_pack,
    "e5_pack_assemble": e5_pack_assemble,
    "e5_classifier_confusion": e5_classifier_confusion,
    "e5_bpe_apply": e5_bpe_apply,
    "e5_bpe_tokens": e5_bpe_tokens,
    "e8_bloom_prefilter": e8_decontaminated,
    "e7_stratified": e7_stratified,
    "e7_upsample": e7_upsample,
    "e3_knn_appended": e3_knn_graph,
    "e3_knn_compacted": e3_knn_graph,
    "e2_incremental": e2_incremental,
    "e2_neardup_ingest": e2_incremental,
    "e2_bands_compacted": e2_incremental,
    "pipeline_e2e": pipeline_e2e,
    "pipeline_dashboard": pipeline_dashboard,
    "pipeline_topn": pipeline_topn,
    "a25_kmv_distinct": a25_kmv_distinct,
    "s25_cdc_apply": s25_cdc_apply,
    "s29_cdc_stream": s25_cdc_apply,
    "a4_group_mean": a4_group_mean,
    "a13_typed_mean": a13_typed_mean,
    "a15_weighted_avg": a15_weighted_avg,
    "w1_window_agg": w1_window_agg,
    "a19_ks_drift": a19_ks_drift,
    "w5_funnel": w5_funnel,
    "a20_benford": a20_benford,
    "e5_vocab_coverage": e5_vocab_coverage,
    "e7_epoch_shuffle": e7_epoch_shuffle,
    "s16_stats_collect": s16_stats_collect,
    "e3_kcenter": e3_kcenter,
    "e2_knn_communities": e2_knn_communities,
    "e5_backoff_score": e5_backoff_score,
    "e3_kmeans": e3_kmeans,
    "e2_pagerank": e2_pagerank,
    "s19_rollup_incremental": s19_rollup_incremental,
    # s31 composes s19's refresh with the s30 rewrite; its result is
    # the same whole-table day rollup s19's replay recomputes
    "s31_mv_refresh": s19_rollup_incremental,
    "w11_streaks": w11_streaks,
    "p11_quantile_bin": p11_quantile_bin,
    "e2_bfs_hops": e2_bfs_hops,
    "e3_mrr_eval": e3_mrr_eval,
    "s21_rollup_ndv": s21_rollup_ndv,
    "a27_autocorr": a27_autocorr,
    "j13_interp_join": j13_interp_join,
    "s22_zonemap_skip": s22_zonemap_skip,
    "s24_manifest_stream": s22_zonemap_skip,
    "s26_zonemap_compact": s22_zonemap_skip,
    "s23_snapshot_diff": s23_snapshot_diff,
    "j14_bloom_join": j14_bloom_join,
    "j16_cbo_reorder": j16_cbo_reorder,
    "j17_aqe_skew": j17_aqe_skew,
    "s30_mv_rewrite": s30_mv_rewrite,
    "s32_rollup_quantile": s32_rollup_quantile,
    # streaming twin: any batching merges to the same min-k sketch, so
    # the replay is the batch twin's whole-table sketch verbatim
    "s32_quantile_stream": s32_rollup_quantile,
    "s33_mv_multikey": s33_mv_multikey,
    "s34_mv_coarsen": s34_mv_coarsen,
    "s35_mv_avg": s35_mv_avg,
    "s36_mv_cdc": s36_mv_cdc,
    "s37_mv_join": s37_mv_join,
    "s38_mv_join_refresh": s38_mv_join_refresh,
    "s39_mv_join_stream": s39_mv_join_stream,
    "s40_mv_join_dimcdc": s40_mv_join_dimcdc,
    # streaming twin: disjoint-customer batches commute to the same table
    "s49_mv_dimcdc_stream": s40_mv_join_dimcdc,
    "s41_mv_choose": s41_mv_choose,
    "j21_chain_elim": j21_chain_elim,
    "s50_ndv_rewrite": s50_ndv_rewrite,
    "s51_ndv_metastore": s51_ndv_metastore,
    "s52_bitmap_ndv": s52_bitmap_ndv,
    "s53_bitmap_rewrite": s53_bitmap_rewrite,
    "a28_segment_overlap": a28_segment_overlap,
    "s52_bitmap_stream": s52_bitmap_ndv,
    "s54_fd_prune": s54_fd_prune,
    "s55_bitmap_coarsen": s55_bitmap_coarsen,
    "o17_multi_touch": o17_multi_touch,
    "a29_retention_bitmap": a29_retention_bitmap,
    "e4_stats_stream": e4_decode_stats,
    "e7_split_stream": e7_split,
    # the detection gate and the append gate run on the deterministic
    # prefix third; the saved artifact stays the FULL dupSpans report
    "e1_suffix_spans": lambda sf: e1_suffix_spans(sf, sliced=True),
    "e1_spans_appended": lambda sf: e1_suffix_spans(sf, sliced=True),
    # compaction is probe-invariant by law: same sliced replay
    "e1_spans_compacted": lambda sf: e1_suffix_spans(sf, sliced=True),
    "e1_span_scrub": e1_span_scrub,
    # the saved artifact IS the dupSpans report; the stream twin is the
    # batch scrub under forced one-file micro-batches
    "e1_spans_saved": e1_suffix_spans,
    "e1_scrub_stream": e1_span_scrub,
    "e5_url_canon": e5_url_canon,
    "e1_url_dedup": e1_url_dedup,
    "e5_link_extract": e5_link_extract,
    "e5_link_stream": e5_link_extract,
    "e2_host_rank": e2_host_rank,
    "e6_host_quality": e6_host_quality,
    "e7_rank_weighted": e7_rank_weighted,
    # keep-at-landing twin: stateless stream-static join, batch oracle
    "e7_rank_stream": e7_rank_weighted,
    "e5_line_dedup": e5_line_dedup,
    "e5_html_stream": e5_html_extract,
    "e3_graph_search": e3_graph_search,
    # append ≡ rebuild: the ingested graph answers like the rebuilt one
    "e3_graph_search_appended": e3_graph_search,
    "e3_graph_search_external": e3_graph_search_external,
    "e3_graph_search_ext_saved": e3_graph_search_ext_saved,
    # the gate trains its codebooks on the deterministic slice
    # (vec_id < 4 seed rows OR vec_id % 3 == 1); the saved twin's
    # standing artifacts are full-corpus-trained
    "e3_graph_search_adc":
        lambda sf: e3_graph_search_adc(sf, train=lambda v: v < 4 or v % 3 == 1),
    "e3_graph_search_adc_saved": e3_graph_search_adc,
    "j18_join_elim": j18_join_elim,
    "j19_elim_then_mv": j19_elim_then_mv,
    "j20_left_elim": j20_left_elim,
    "o16_attribution": o16_attribution,
    "s48_count_distinct_elim": s48_count_distinct_elim,
    "s44_count_pushdown": s44_count_pushdown,
    "s45_distinct_elim": s45_distinct_elim,
    "s46_deletion_vectors": s46_deletion_vectors,
    "s47_mor_upsert": s47_mor_upsert,
    "s42_topk_maintain": s42_topk_maintain,
    # streaming twin: any batching merges to the same exact top-k
    "s42_topk_stream": s42_topk_maintain,
    "s43_mv_metastore": s43_mv_metastore,
    "j15_join_size_profile": j15_join_size_profile,
    "e2_sssp_weighted": e2_sssp_weighted,
    "p13_ref_integrity": p13_ref_integrity,
    "o15_rfm_segments": o15_rfm_segments,
    "o15_edges": o15_edges,
    "o15_scores": o15_scores,
    "o15_rowhash": o15_rowhash,
    # r14 full-registry closure: every remaining batch query
    "p1_normalize_names": p1_normalize_names,
    "p2_coerce_cast": p2_coerce_cast,
    "p3_null_drop": p3_null_drop,
    "p4_filter": p4_filter,
    "p5_project": p5_project,
    "p6_drop": p6_drop,
    "p8_profile": p8_profile,
    "p10_expectations": p10_expectations,
    "p12_feature_matrix": p12_feature_matrix,
    "a1_count": a1_count,
    "a2_count_distinct": a2_count_distinct,
    "a5_group_mean_sort": a5_group_mean_sort,
    "a6_rollup": a6_rollup,
    "a7_conditional_agg": a7_conditional_agg,
    "a8_pivot": a8_pivot,
    "a9_above_avg": a9_above_avg,
    "j1_join_inner": j1_join_inner,
    "j1_join_3way": j1_join_3way,
    "j2_left_join": j2_left_join,
    "j3_semi_anti": j3_semi_anti,
    "j4_salted_join": j4_salted_join,
    "j6_range_join": j6_range_join,
    "j7_interval_overlap": j7_interval_overlap,
    "j8_range_auto": j8_range_auto,
    "j9_basket_pairs": j9_basket_pairs,
    "j10_dpp": j10_dpp,
    "j12_asof_tolerance": j12_asof_tolerance,
    "o1_sort_desc": o1_sort_desc,
    "o2_sort_asc": o2_sort_asc,
    "o3_topk": o3_topk,
    "o4_topk_per_group": o4_topk_per_group,
    "o5_window_analytics": o5_window_analytics,
    "o6_percentiles": o6_percentiles,
    "o7_rank_family": o7_rank_family,
    "o8_window_frames": o8_window_frames,
    "u1_set_ops": u1_set_ops,
    "u2_bag_ops": u2_bag_ops,
    "f1_string_funcs": f1_string_funcs,
    "f2_f3_format": f2_f3_format,
    "f4_datetime": f4_datetime,
    "f5_json": f5_json,
    "f6_math_toolkit": f6_math_toolkit,
    "f7_string_toolkit": f7_string_toolkit,
    "f8_null_toolkit": f8_null_toolkit,
    "s1_csv_roundtrip": s1_csv_roundtrip,
    "s2_json_roundtrip": s2_json_roundtrip,
    "s3_orc_roundtrip": s3_orc_roundtrip,
    "s7_cached_fanout": s7_cached_fanout,
    "s9_partitioned_prune": s9_partitioned_prune,
    "s10_zorder": s10_zorder,
    "s11_table_checksum": s11_table_checksum,
    "s12_compact": s12_compact,
    "s13_xml_roundtrip": s13_xml_roundtrip,
    "s17_schema_merge": s17_schema_merge,
    "s18_bucketed_join": s18_bucketed_join,
}


def main(out_dir, sf_dir, out_json=None):
    results = {}
    n_fail = 0
    for name, fn in sorted(QUERIES.items()):
        rec = {"err": None, "match": False, "rows": None}
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(fn(sf_dir))
            rec["rows"] = int(len(got))
            assert list(got.columns) == list(want.columns), \
                f"cols {list(got.columns)} vs {list(want.columns)}"
            assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            rec["match"] = True
            print(f"{name:24s} PASS rows={len(got)} (independent replay, bit-exact)")
        except Exception as e:
            rec["err"] = str(e).split("\n")[0][:300]
            n_fail += 1
            print(f"{name:24s} FAIL {rec['err']}")
        results[name] = rec
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    print(f"\n{len(results) - n_fail} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None))
