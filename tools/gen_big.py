"""Fast vectorized synthetic-dataset generator for genome-scale runs.

tests/data_gen.py is convenient but per-read Python; at 2 Gbp of reads it
takes tens of minutes.  This generator builds everything as numpy byte
arrays: genome, population VCF (sorted, non-overlapping sites, Dirichlet-ish
allele frequencies over all samples), the target sample's haplotype
sequences, and fixed-width FASTQ records composed as [N, record_len] uint8
matrices written through gzip level 1.

Usage: python tools/gen_big.py OUT_DIR [--mb 100] [--variants 100000]
           [--samples 50] [--depth 20] [--files 4] [--seed 7]
Writes ref.fa, vars.vcf.gz, S1_{i}.fq.gz, samples.cfg, truth.npz.
"""

from __future__ import annotations

import argparse
import gzip
import os
import sys

import numpy as np

BASES = np.frombuffer(b"ACGT", np.uint8)
COMP = np.zeros(256, np.uint8)
for a, b in zip(b"ACGT", b"TGCA"):
    COMP[a] = b

READ_LEN = 150


def make_genome(rng, length: int) -> np.ndarray:
    return BASES[rng.integers(0, 4, size=length)]


def make_sites(rng, glen: int, n: int, nhap: int):
    """Sorted non-overlapping sites: returns (pos[1-based], ref_str, alt_str,
    gts [n, nhap]) lists/arrays."""
    # positions with >= 80 bp spacing (deletions reach 60 bp)
    pos = np.sort(rng.choice(np.arange(100, glen - 200, 80), size=n,
                             replace=False))
    kinds = rng.random(n)
    ref_lens = np.ones(n, np.int64)
    alt_lens = np.ones(n, np.int64)
    ins = (kinds >= 0.85) & (kinds < 0.925)   # insertion
    dele = kinds >= 0.925                     # deletion
    alt_lens[ins] = rng.integers(2, 61, size=int(ins.sum()))
    ref_lens[dele] = rng.integers(2, 61, size=int(dele.sum()))
    # allele frequency per site; haplotype GTs are iid Bernoulli(af)
    af = rng.uniform(0.05, 0.95, size=n)
    gts = (rng.random((n, nhap)) < af[:, None]).astype(np.int16)
    return pos, ref_lens, alt_lens, gts


def write_vcf(path, chrom, genome, pos, ref_lens, alt_lens, gts, rng,
              sample_names):
    n = len(pos)
    alt_strs = []
    ref_strs = []
    for i in range(n):
        p = pos[i] - 1  # 0-based
        ref = genome[p : p + ref_lens[i]].tobytes().decode()
        if alt_lens[i] == 1 and ref_lens[i] == 1:
            # SNP: a different base
            cur = ref[0]
            choices = [c for c in "ACGT" if c != cur]
            alt = choices[int(rng.integers(0, 3))]
        elif alt_lens[i] > 1:  # insertion: same first base + random tail
            tail = BASES[rng.integers(0, 4, size=int(alt_lens[i]) - 1)]
            alt = ref[0] + tail.tobytes().decode()
        else:  # deletion: ALT is the first REF base
            alt = ref[0]
        ref_strs.append(ref)
        alt_strs.append(alt)
    nsample = gts.shape[1] // 2
    with gzip.open(path, "wt", compresslevel=1) as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write(f"##contig=<ID={chrom},length={len(genome)}>\n")
        fh.write('##INFO=<ID=NS,Number=1,Type=Integer,Description="n">\n')
        fh.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="GT">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + "\t".join(sample_names) + "\n")
        for i in range(n):
            gt_cols = "\t".join(
                f"{gts[i, 2*s]}/{gts[i, 2*s+1]}" for s in range(nsample)
            )
            fh.write(
                f"{chrom}\t{pos[i]}\t.\t{ref_strs[i]}\t{alt_strs[i]}\t30\t"
                f"PASS\tNS={nsample}\tGT\t{gt_cols}\n"
            )
    return ref_strs, alt_strs


def apply_hap(genome, pos, ref_lens, alt_strs, hap_gt) -> np.ndarray:
    """Splice ALT alleles of sites where hap_gt==1 into the genome bytes."""
    parts = []
    cur = 0
    for i in np.flatnonzero(hap_gt):
        p = pos[i] - 1
        parts.append(genome[cur:p])
        parts.append(np.frombuffer(alt_strs[i].encode(), np.uint8))
        cur = p + ref_lens[i]
    parts.append(genome[cur:])
    return np.concatenate(parts)


def write_reads(out_paths, hap_seqs, depth, rng, ploidy=2):
    """Fixed-width FASTQ records composed as byte matrices, round-robin
    across out_paths.  ``depth`` is total per-locus coverage (each haplotype
    sequence gets depth/ploidy regardless of chromosome count)."""
    handles = [gzip.open(p, "wb", compresslevel=1) for p in out_paths]
    total_reads = 0
    fi = 0
    for hs in hap_seqs:
        n_reads = int(len(hs) * (depth / ploidy) / READ_LEN)
        chunk = 1 << 19
        for c0 in range(0, n_reads, chunk):
            m = min(chunk, n_reads - c0)
            starts = rng.integers(0, len(hs) - READ_LEN, size=m)
            reads = hs[starts[:, None] + np.arange(READ_LEN)]
            rc = rng.random(m) < 0.5
            reads[rc] = COMP[reads[rc][:, ::-1]]
            # record layout: @r%08d\n  seq\n  +\n  quals\n
            rec_len = 11 + READ_LEN + 1 + 2 + READ_LEN + 1
            buf = np.empty((m, rec_len), np.uint8)
            ids = np.arange(total_reads + c0, total_reads + c0 + m)
            buf[:, 0] = ord("@")
            buf[:, 1] = ord("r")
            for d in range(8):  # digits of %08d
                buf[:, 2 + d] = (ids // 10 ** (7 - d)) % 10 + ord("0")
            buf[:, 10] = ord("\n")
            buf[:, 11 : 11 + READ_LEN] = reads
            o = 11 + READ_LEN
            buf[:, o] = ord("\n")
            buf[:, o + 1] = ord("+")
            buf[:, o + 2] = ord("\n")
            buf[:, o + 3 : o + 3 + READ_LEN] = ord("I")
            buf[:, o + 3 + READ_LEN] = ord("\n")
            handles[fi % len(handles)].write(buf.tobytes())
            fi += 1
        total_reads += n_reads
    for h in handles:
        h.close()
    return total_reads


def generate(out_dir, mb=100, n_variants=100_000, n_samples=50, depth=20.0,
             n_files=4, seed=7, n_chroms=2):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    nhap = 2 * n_samples
    sample_names = [f"S{i+1}" for i in range(n_samples)]
    chrom_len = mb * 1_000_000 // n_chroms
    var_per_chrom = n_variants // n_chroms

    ref_path = os.path.join(out_dir, "ref.fa")
    vcf_path = os.path.join(out_dir, "vars.vcf.gz")
    truth = {}
    hap_seqs = []
    vcf_parts = []
    with open(ref_path, "w") as ref_fh:
        for ci in range(n_chroms):
            chrom = f"chr{ci+1}"
            print(f"[gen] {chrom}: genome {chrom_len/1e6:.0f} Mb ...",
                  file=sys.stderr, flush=True)
            genome = make_genome(rng, chrom_len)
            ref_fh.write(f">{chrom}\n")
            g = genome.tobytes().decode()
            for j in range(0, len(g), 10_000_000):
                ref_fh.write(g[j : j + 10_000_000] + "\n")
            pos, ref_lens, alt_lens, gts = make_sites(
                rng, chrom_len, var_per_chrom, nhap
            )
            part = os.path.join(out_dir, f".vcf_{chrom}.gz")
            print(f"[gen] {chrom}: {var_per_chrom} sites ...",
                  file=sys.stderr, flush=True)
            ref_strs, alt_strs = write_vcf(
                part, chrom, genome, pos, ref_lens, alt_lens, gts, rng,
                sample_names,
            )
            vcf_parts.append(part)
            truth[chrom] = (pos, gts[:, 0], gts[:, 1])  # S1 = haps 0,1
            print(f"[gen] {chrom}: haplotype sequences ...",
                  file=sys.stderr, flush=True)
            hap_seqs.append(apply_hap(genome, pos, ref_lens, alt_strs, gts[:, 0]))
            hap_seqs.append(apply_hap(genome, pos, ref_lens, alt_strs, gts[:, 1]))
            del genome

    # merge per-chrom VCFs (header from the first)
    with gzip.open(vcf_path, "wb", compresslevel=1) as out:
        for i, part in enumerate(vcf_parts):
            with gzip.open(part, "rb") as fh:
                for line in fh:
                    if i > 0 and line.startswith(b"#"):
                        continue
                    out.write(line)
            os.remove(part)

    fq_paths = [os.path.join(out_dir, f"S1_{i}.fq.gz") for i in range(n_files)]
    print(f"[gen] reads: {depth}x over {mb} Mb -> {len(fq_paths)} files ...",
          file=sys.stderr, flush=True)
    total = write_reads(fq_paths, hap_seqs, depth, rng)
    print(f"[gen] {total} reads written", file=sys.stderr, flush=True)

    with open(os.path.join(out_dir, "samples.cfg"), "w") as fh:
        fh.write("S1 " + " ".join(fq_paths) + "\n")
    np.savez_compressed(
        os.path.join(out_dir, "truth.npz"),
        **{
            f"{c}_{name}": arr
            for c, (pos, g0, g1) in truth.items()
            for name, arr in (("pos", pos), ("gt0", g0), ("gt1", g1))
        },
    )
    return {
        "ref": ref_path, "vcf": vcf_path, "fqs": fq_paths,
        "cfg": os.path.join(out_dir, "samples.cfg"),
        "truth": os.path.join(out_dir, "truth.npz"),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--mb", type=int, default=100)
    ap.add_argument("--variants", type=int, default=100_000)
    ap.add_argument("--samples", type=int, default=50)
    ap.add_argument("--depth", type=float, default=20.0)
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--chroms", type=int, default=2)
    args = ap.parse_args()
    generate(args.out_dir, args.mb, args.variants, args.samples, args.depth,
             args.files, args.seed, args.chroms)
