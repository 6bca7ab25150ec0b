"""Compare two varigraph VCF outputs (GT concordance + field drift), and
each against the simulated truth when a truth.npz is given.

Usage: python tools/vcf_compare.py A.vcf.gz B.vcf.gz [truth.npz]
"""
import gzip
import sys

import numpy as np


def read_calls(path):
    calls = {}
    with gzip.open(path, "rt") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            gt = f[9].split(":")[0]
            if "." in gt:
                continue
            calls[(f[0], int(f[1]))] = tuple(sorted(int(g) for g in gt.split("/")))
    return calls


def read_truth(path):
    truth = np.load(path)
    chroms = sorted({k.rsplit("_", 1)[0] for k in truth.files})
    out = {}
    for c in chroms:
        for p, a, b in zip(truth[f"{c}_pos"], truth[f"{c}_gt0"], truth[f"{c}_gt1"]):
            out[(c, int(p))] = tuple(sorted((int(a), int(b))))
    return out


def vs_truth(name, calls, truth):
    n_eval = n_match = n_missing = 0
    for key, exp in truth.items():
        if exp == (0, 0):
            continue
        n_eval += 1
        got = calls.get(key)
        if got is None:
            n_missing += 1
        elif got == exp:
            n_match += 1
    print(f"{name}: {n_match}/{n_eval} = {n_match/max(n_eval,1):.4f} vs truth "
          f"(missing {n_missing})")


a = read_calls(sys.argv[1])
b = read_calls(sys.argv[2])
keys = set(a) | set(b)
both = sum(1 for k in keys if k in a and k in b)
same = sum(1 for k in keys if a.get(k) is not None and a.get(k) == b.get(k))
print(f"sites: A {len(a)}, B {len(b)}, shared {both}")
print(f"GT identical on shared: {same}/{both} = {same/max(both,1):.4f}")
if len(sys.argv) > 3:
    truth = read_truth(sys.argv[3])
    vs_truth("A", a, truth)
    vs_truth("B", b, truth)
