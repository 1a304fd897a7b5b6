#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracle parity.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Replicates the driver's t2 compare: for each query dir under
<verifyOutDir>, read the Spark parquet result, run the corresponding
oracle SQL from oracle_sql.json in DuckDB (tables = views over the
sfDir parquet files), then compare with columns sorted by name and
rows sorted by all columns. Floats compared to 9 significant digits.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        vals = df[c]
        if vals.dtype == object and len(vals) and isinstance(vals.iloc[0], bytes):
            df[c] = vals.apply(lambda b: b.hex())
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def table_hash(df: pd.DataFrame):
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]


def png_rgb_means(payload: bytes):
    """Independent PNG decode (stdlib zlib + de-filtering, no PIL):
    returns (width, height, mean_r, mean_g, mean_b) for 8-bit non-
    interlaced truecolor PNGs — exactly what the JVM side writes."""
    import struct
    import zlib
    assert payload[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, idat, w, h, bitd, ctype = 8, b"", 0, 0, 0, 0
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bitd, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            assert bitd == 8 and ctype in (2, 6) and interlace == 0, \
                f"unsupported PNG shape: depth={bitd} color={ctype} interlace={interlace}"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    bpp = 3 if ctype == 2 else 4
    stride = w * bpp
    prev = bytearray(stride)
    sr = sg = sb = 0
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 1:
                line[i] = (line[i] + a) & 0xFF
            elif f == 2:
                line[i] = (line[i] + b) & 0xFF
            elif f == 3:
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif f == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        for x in range(w):
            sr += line[x * bpp]
            sg += line[x * bpp + 1]
            sb += line[x * bpp + 2]
        prev = line
    n = w * h
    return w, h, sr / n, sg / n, sb / n


def wav_stats(payload: bytes):
    """Independent WAV decode (stdlib wave): (rate, n, duration_ms, peak, rms)."""
    import io
    import math as m
    import wave as wv
    with wv.open(io.BytesIO(payload)) as f:
        rate, n = f.getframerate(), f.getnframes()
        assert f.getsampwidth() == 2 and f.getnchannels() == 1
        raw = f.readframes(n)
    peak, ssq = 0, 0
    for i in range(n):
        v = int.from_bytes(raw[2 * i:2 * i + 2], "little", signed=True)
        peak = max(peak, abs(v))
        ssq += v * v
    return rate, n, n * 1000 // rate, peak, m.sqrt(ssq / n)


def check_multimodal(name: str, df: pd.DataFrame):
    """Cross-check the JVM codec statistics against the independent Python
    decoders above. Returns (n_checked, mismatches)."""
    bad = []
    for row in df.itertuples(index=False):
        if name == "multimodal_decode_real":
            w, h, mr, mg, mb = png_rgb_means(bytes(row.payload))
            ok = (w == row.width and h == row.height
                  and abs(mr - row.mean_r) < 5e-7 and abs(mg - row.mean_g) < 5e-7
                  and abs(mb - row.mean_b) < 5e-7)
        else:  # multimodal_audio_real
            rate, n, dur, peak, rms = wav_stats(bytes(row.payload))
            ok = (rate == row.sample_rate and n == row.n_samples
                  and dur == row.duration_ms and peak == row.peak
                  and abs(rms - row.rms) < 5e-7)
        if not ok:
            bad.append(row.id)
    return len(df), bad


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    for name in sorted(os.listdir(out_dir)):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        spark_df = pd.concat(
            [pd.read_parquet(f"{out_dir}/{name}/{f}")
             for f in os.listdir(f"{out_dir}/{name}") if f.endswith(".parquet")],
            ignore_index=True)
        if name in ("multimodal_decode_real", "multimodal_audio_real"):
            n, bad = check_multimodal(name, spark_df)
            if bad:
                print(f"{'CODEC-MISMATCH':18} {name}: ids {bad[:5]} of {n}")
                n_fail += 1
            else:
                print(f"{'CODEC-VERIFIED':18} {name} ({n} rows re-decoded in Python)")
                n_pass += 1
            continue
        if name not in oracle:
            status = "ROWS-ONLY" if len(spark_df) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status:18} {name} ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{'ORACLE-ERROR':18} {name}: {str(e)[:160]}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"{'COL-MISMATCH':18} {name}: spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        # The driver's compare stringifies values without float normalization,
        # so an integer column on one side vs float on the other ("5" vs "5.0")
        # fails there even when values agree. DuckDB returns HUGEINT (-> pandas
        # float64) for SUM(int)/count_if: oracles must CAST(... AS BIGINT).
        dtype_diff = [
            c for c in a.columns
            if (pd.api.types.is_integer_dtype(a[c]) != pd.api.types.is_integer_dtype(b[c])
                and not (a[c].isna().any() or b[c].isna().any()))]
        if dtype_diff:
            print(f"{'DTYPE-MISMATCH':18} {name}: int/float disagree on {dtype_diff} "
                  f"(spark={[str(a[c].dtype) for c in dtype_diff]} "
                  f"duck={[str(b[c].dtype) for c in dtype_diff]}) — driver would fail this")
            n_fail += 1
            continue
        ha, hb = table_hash(a), table_hash(b)
        if ha == hb:
            print(f"{'PASS':18} {name} ({len(a)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            diffs = [(i, x, y) for i, (x, y) in enumerate(zip(ha, hb)) if x != y][:3]
            print(f"{'HASH-MISMATCH':18} {name}: rows spark={len(ha)} duck={len(hb)}")
            for i, x, y in diffs:
                print(f"    row {i}: spark={x}")
                print(f"    row {i}:  duck={y}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
