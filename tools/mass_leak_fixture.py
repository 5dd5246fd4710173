#!/usr/bin/env python3
"""Build a mass-contamination copy of a testdata SF dir: documents gets a
benchmark passage planted verbatim into MORE train docs than the winnowed
decontamination's maxDf stop-cap (50), plus one bench-side carrier.

Usage: python3 tools/mass_leak_fixture.py <srcSfDir> <dstDir>

This is the one DOCUMENTED false-negative mode of the winnowed
decontamination family (Corpus.decontaminateWinnowed's maxDf cap): a
benchmark passage leaked into > maxDf training docs is indistinguishable
from corpus boilerplate by train-df alone, so the capped verdict (d49)
reports every copy clean. The audit view (d53,
Corpus.massContaminationSuspects) exists to surface exactly those docs —
this fixture is the planted-leak arm that proves, through the FULL
driver gate (Verify + selfcheck), that the declared d53 names the
planted docs while everything else stays green:

    python3 tools/mass_leak_fixture.py /root/testdata/sf0.001 /tmp/leak
    SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify /tmp/leak /tmp/v_leak"
    python3 tools/selfcheck.py /tmp/leak /tmp/v_leak
    # + gate.sh's nonempty check on /tmp/v_leak/d53_*/

Planted rows (ids 1000..1059 train, 1067 bench — the declared pmod-97
split: id % 97 == 0 is bench; 97*11 = 1067 is the only multiple in
range): every planted doc carries the same 80-char passage, long past
the w+k-1 detection span of BOTH the declared k=20 and the production
k=40 winnow granularity, inside unique filler that keeps each doc
otherwise distinct. 60 train carriers > maxDf=50 → the passage's
fingerprints are stop-capped out of the d49 verdict and every planted
doc must instead appear in d53's suspect set.
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

PASSAGE = ("the quick auditing fox surveys every benchmark passage "
           "for verbatim leakage traces")
# Identical >= 43-char margins (w+k-1 at the PRODUCTION k=40; the declared
# k=20 needs 23) around the passage in EVERY train doc, with the per-doc
# unique tokens strictly outside them: winnowing's fingerprint selection
# is a pure function of the local char window, so inside the margins all
# 60 train docs select the SAME fingerprints — every bench-matching
# fingerprint therefore has train-df = 60 > maxDf and is stop-capped out
# of the d49 verdict (the false-negative mode under audit). A first
# version with digit-suffixed unique tokens adjacent to the passage let
# subsets of train docs share sub-cap boundary fingerprints with the
# bench carrier and d49 flagged 36 of them; the margins are what make
# "capped clean + audited suspect" hold for all 60.
HEAD = "headfill alpha beta gamma delta omicron upsilon"     # 47 chars
TAIL = "epsilon zeta eta theta iota kappa lambda tailfill"   # 49 chars
TRAIN_IDS = list(range(1000, 1060))   # 60 > maxDf=50; none % 97 == 0
BENCH_IDS = [1067]                    # 97 * 11


def uniq_word(prefix, i):
    # letters only: digit suffixes would let id-structure-sharing docs
    # produce common boundary k-grams
    return prefix + "".join(chr(ord('a') + int(c)) for c in str(i))


def main(src, dst):
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        if t != "documents":
            # always re-point: a reused dst dir with a different src would
            # otherwise silently keep stale symlinks and mix two fixtures
            # (lexists, not exists: a dangling symlink must be replaced too)
            if os.path.lexists(d):
                os.remove(d)
            os.symlink(os.path.abspath(s), d)
            continue
        tbl = pa.parquet.read_table(s)
        assert max(tbl.column("doc_id").to_pylist()) < TRAIN_IDS[0], \
            "planted ids collide with the source fixture"
        rows = []
        for i in TRAIN_IDS:
            text = (f"{uniq_word('uqtrain', i)} {HEAD} {PASSAGE} {TAIL} "
                    f"{uniq_word('trailer', i)}")
            rows.append({"doc_id": i, "text": text, "lang": "en",
                         "source": "src1", "n_chars": len(text)})
        for i in BENCH_IDS:
            # completely distinct filler: the ONLY bench-train overlap is
            # the passage itself
            text = (f"{uniq_word('benchprobe', i)} rho sigma tau phi chi "
                    f"psi omega {PASSAGE} mu nu xi pi benchend")
            rows.append({"doc_id": i, "text": text, "lang": "en",
                         "source": "src1", "n_chars": len(text)})
        planted = pa.Table.from_pylist(rows, schema=tbl.schema)
        pq.write_table(pa.concat_tables([tbl, planted]), d)
    print(f"mass-leak fixture at {dst}: {len(TRAIN_IDS)} train carriers "
          f"(> maxDf=50) + {len(BENCH_IDS)} bench carrier")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
