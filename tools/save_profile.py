"""Profile save_graph / load_graph phase costs at scale (CPU backend).

Usage: python tools/save_profile.py /tmp/vg_1g/graph.vgt
Prints per-phase timings for the save path (node walk, vcf blob, per-member
zip writes) and the load path, to target the VERDICT r4 #7 'halve
save/load' work.
"""

import os
import sys
import time
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    src = sys.argv[1]
    from varigraph_tpu.index import serialize as S

    t0 = time.time()
    gi = S.load_graph(src)
    print(f"load_graph total: {time.time() - t0:.1f}s", flush=True)

    # ---- save phases ----
    t0 = time.time()
    chroms = sorted(gi.graph.nodes.keys())
    chrom_of = {c: i for i, c in enumerate(chroms)}
    node_chrom = []
    node_start = []
    node_nseq = []
    node_ngt = []
    node_nkmer = []
    seq_lens = []
    seq_parts = []
    gt_parts = []
    kmer_parts = []
    local_bits_rows = []
    nbytes = (gi.nhap + 7) // 8
    for c in chroms:
        for n in gi.graph.nodes[c]:
            node_chrom.append(chrom_of[c])
            node_start.append(n.start)
            node_nseq.append(len(n.seqs))
            node_ngt.append(len(n.hap_gt))
            node_nkmer.append(len(n.kmer_hashes))
            for s in n.seqs:
                seq_lens.append(len(s))
                seq_parts.append(s.encode("ascii"))
            if len(n.hap_gt):
                gt_parts.append(np.asarray(n.hap_gt, np.uint16))
            if len(n.kmer_hashes):
                kmer_parts.append(np.asarray(n.kmer_hashes, np.uint64))
                local_bits_rows.append(
                    np.asarray(n.local_bits, np.uint8).reshape(
                        len(n.kmer_hashes), -1))
    print(f"node walk: {time.time() - t0:.1f}s "
          f"({len(node_chrom)} nodes, {len(seq_parts)} seqs)", flush=True)

    t0 = time.time()
    gt_flat = np.concatenate(gt_parts)
    kmer_flat = np.concatenate(kmer_parts)
    local_bits_arr = np.concatenate(local_bits_rows)
    seq_blob = b"".join(seq_parts)
    print(f"concat: {time.time() - t0:.1f}s (kmer_flat {len(kmer_flat)}, "
          f"seq_blob {len(seq_blob)/1e9:.2f} GB, local_bits "
          f"{local_bits_arr.nbytes/1e9:.2f} GB)", flush=True)

    t0 = time.time()
    vcf_lines = []
    for c, smap in gi.vcf_info.items():
        for start, cols in smap.items():
            vcf_lines.append("\t".join([c, str(start)] + cols))
    blob = zlib.compress("\n".join(vcf_lines).encode("utf-8"), 6)
    print(f"vcf blob: {time.time() - t0:.1f}s ({len(blob)/1e6:.0f} MB)",
          flush=True)

    # per-member zip write cost
    members = dict(
        seq_blob=np.frombuffer(seq_blob, np.uint8),
        gt_flat=gt_flat,
        kmer_flat=kmer_flat,
        local_bits=local_bits_arr,
        tbl_keys=gi.table.keys_np(),
        tbl_freq=gi.table.freq_np(),
        tbl_bits=gi.table.hap_words_np(),
        tbl_refflag=gi.table.refflag_np(),
    )
    for name, arr in members.items():
        t0 = time.time()
        with open("/tmp/_member_probe.npz", "wb") as fh:
            S._savez_level1(fh, **{name: arr})
        print(f"write {name}: {time.time() - t0:.1f}s "
              f"({np.asanyarray(arr).nbytes/1e9:.2f} GB raw -> "
              f"{os.path.getsize('/tmp/_member_probe.npz')/1e9:.2f} GB)",
              flush=True)
    os.remove("/tmp/_member_probe.npz")


if __name__ == "__main__":
    main()
