"""Profile the index_graph host aggregation at 1 Gbp-rehearsal scale.

Synthesizes inputs matching the recorded rehearsal stats (500k variant
nodes, ~1.0M unique walk groups, ~1.0M distinct contexts, ~29M final
table k-mers; /tmp/reh_construct.log 2026-08-20) and times each step of
the aggregation pipeline in varigraph_tpu/index/build.py:437-535 to find
the ~22-minute silent sink the round-3 rehearsal exposed.

Usage: python tools/agg_profile.py [scale]   (scale=1.0 -> full rehearsal size)
"""
import sys
import time

import numpy as np

scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
NTASKS = int(500_000 * scale)
NGROUPS = int(1_000_000 * scale)
NCTX = int(1_000_000 * scale)
KMERS_PER_CTX = 30
NBYTES = 26  # ceil(201 haps / 8)

rng = np.random.default_rng(0)
t0 = time.time()


def tick(label):
    global t0
    t = time.time()
    print(f"{label:45s} {t - t0:8.1f}s", flush=True)
    t0 = t


# ---- synthetic inputs ----
g_task = np.sort(rng.integers(0, NTASKS, NGROUPS))
g_cid = rng.integers(0, NCTX, NGROUPS)
g_bits = rng.integers(0, 256, (NGROUPS, NBYTES), dtype=np.uint8)
g_alt = rng.random(NGROUPS) < 0.5
g_h0 = rng.random(NGROUPS) < 0.5
ctx_lens = rng.integers(KMERS_PER_CTX - 3, KMERS_PER_CTX + 4, NCTX)
ctx_tot = int(ctx_lens.sum())
flat_kmers = rng.integers(0, 1 << 63, ctx_tot, dtype=np.uint64) << np.uint64(1)
ctx_starts = np.concatenate([[0], np.cumsum(ctx_lens)])
uniq_ctx_kmers = [
    flat_kmers[ctx_starts[i]:ctx_starts[i + 1]] for i in range(NCTX)
]
uniq_kmers = np.unique(flat_kmers)
uniq_counts = rng.integers(0, 3, len(uniq_kmers), dtype=np.uint8)
tick("synthesize inputs")

# ---- the aggregation, step by step (mirrors build.py:449-535) ----
kmer_counts = np.fromiter(
    (len(uniq_ctx_kmers[c]) for c in g_cid), np.int64, len(g_cid)
)
tick("kmer_counts fromiter")

e_task = np.repeat(g_task, kmer_counts)
e_gidx = np.repeat(np.arange(len(g_task), dtype=np.int64), kmer_counts)
tick("repeat e_task/e_gidx")

e_kh = np.concatenate(
    [uniq_ctx_kmers[c] for c, n in zip(g_cid, kmer_counts) if n]
)
tick(f"concat e_kh (E={len(e_kh)/1e6:.1f}M)")

e_fre = uniq_counts[np.searchsorted(uniq_kmers, e_kh)].astype(np.int64)
tick("searchsorted e_fre")

order = np.lexsort((e_kh, e_task))
tick("lexsort (kh, task)")

e_task, e_kh, e_gidx, e_fre = (
    e_task[order], e_kh[order], e_gidx[order], e_fre[order]
)
tick("apply order")

new_pair = np.empty(len(e_kh), bool)
new_pair[0] = True
new_pair[1:] = (e_task[1:] != e_task[:-1]) | (e_kh[1:] != e_kh[:-1])
starts = np.flatnonzero(new_pair)
tick(f"pair starts (P={len(starts)/1e6:.1f}M)")

pair_bits = np.bitwise_or.reduceat(g_bits[e_gidx], starts, axis=0)
tick("bitwise_or.reduceat pair_bits")

pair_task = e_task[starts]
pair_kh = e_kh[starts]
pair_fre = e_fre[starts]
has_alt = np.logical_or.reduceat(g_alt[e_gidx], starts)
has_hap0 = np.logical_or.reduceat(g_h0[e_gidx], starts)
pair_flag = has_alt & (pair_fre >= 1) & ~has_hap0
tick("1-D reduceats + flags")

minfre = np.full(NTASKS, 255, np.int64)
np.minimum.at(minfre, pair_task, pair_fre)
minfre[minfre == 0] = 1
kept_mask = pair_fre <= minfre[pair_task]
tick("minimum.at + kept_mask")

k_task = pair_task[kept_mask]
k_kh = pair_kh[kept_mask]
k_bits = pair_bits[kept_mask]
k_flag = pair_flag[kept_mask]
k_fre = pair_fre[kept_mask]
tick(f"apply kept (K={len(k_kh)/1e6:.1f}M)")

node_starts = np.searchsorted(k_task, np.arange(NTASKS + 1))
views = []
for task_id in range(NTASKS):
    lo, hi = node_starts[task_id], node_starts[task_id + 1]
    views.append((k_kh[lo:hi], k_bits[lo:hi]))
tick("per-node slice loop")

korder = np.argsort(k_kh, kind="stable")
s_kh = k_kh[korder]
s_bits = k_bits[korder]
s_flag = k_flag[korder]
s_fre = k_fre[korder]
tick("global argsort + apply")

kfirst = np.empty(len(s_kh), bool)
kfirst[0] = True
kfirst[1:] = s_kh[1:] != s_kh[:-1]
kstarts = np.flatnonzero(kfirst)
g_kh = s_kh[kstarts]
g_n = np.diff(np.append(kstarts, len(s_kh)))
g_fre2 = s_fre[kstarts]
tick(f"kmer run structure (M={len(g_kh)/1e6:.1f}M)")

g_bits2 = np.bitwise_or.reduceat(s_bits, kstarts, axis=0)
tick("bitwise_or.reduceat global bits")

g_flag = np.logical_or.reduceat(s_flag, kstarts)
base = np.where(g_fre2 >= 2, g_fre2, 1)
g_f = np.minimum(base + g_n - 1, 255)
tick("closed-form merge")

# ---- KmerTable.build_packed equivalent ----
order2 = np.argsort(g_kh, kind="stable")
_ = np.ascontiguousarray(g_kh[order2])
_ = g_f[order2]
_ = g_bits2[order2]
tick("table build argsort + reorders")
print("TOTAL synthetic aggregation done")
