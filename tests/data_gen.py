"""Synthetic test data: tiny genome + population VCF + sample reads.

Produces the inputs for golden end-to-end tests and the bench harness:
a reference FASTA, a multi-sample diploid (or polyploid) VCF of SNPs/indels,
and FASTQ reads drawn from a chosen sample's haplotype sequences so the
expected genotypes are known by construction.
"""

from __future__ import annotations

import gzip
import os

import numpy as np

BASES = np.array(list("ACGT"))


def make_genome(rng: np.random.Generator, lengths: dict[str, int]) -> dict[str, str]:
    return {c: "".join(rng.choice(BASES, size=n)) for c, n in lengths.items()}


def _mutate(base: str, rng: np.random.Generator) -> str:
    alts = [b for b in "ACGT" if b != base]
    return alts[rng.integers(0, 3)]


def make_vcf(
    genome: dict[str, str],
    rng: np.random.Generator,
    n_variants_per_chrom: int = 30,
    samples: tuple[str, ...] = ("S1", "S2", "S3"),
    ploidy: int = 2,
    indel_frac: float = 0.2,
    min_gap: int = 40,
):
    """Returns (vcf_text, truth) where truth maps sample ->
    list of per-haplotype allele choices: {(chrom, pos): [gt per hap]}."""
    header = [
        "##fileformat=VCFv4.2",
        '##INFO=<ID=NS,Number=1,Type=Integer,Description="x">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(samples),
    ]
    lines: list[str] = []
    truth: dict[str, dict[tuple[str, int], list[int]]] = {s: {} for s in samples}

    for chrom, seq in genome.items():
        n = len(seq)
        # variant positions, spaced by at least min_gap
        pos_candidates = np.arange(min_gap, n - min_gap, min_gap)
        if len(pos_candidates) > n_variants_per_chrom:
            sel = rng.choice(len(pos_candidates), n_variants_per_chrom, replace=False)
            positions = np.sort(pos_candidates[sel])
        else:
            positions = pos_candidates
        for pos in positions:
            pos = int(pos)
            if rng.random() < indel_frac:
                # deletion of 3 bases or insertion of 3 bases
                if rng.random() < 0.5:
                    ref = seq[pos - 1 : pos + 3]
                    alt = ref[0]
                else:
                    ref = seq[pos - 1]
                    alt = ref + "".join(rng.choice(BASES, size=3))
            else:
                ref = seq[pos - 1]
                alt = _mutate(ref, rng)
            gts = []
            for s in samples:
                hap_gts = [int(rng.random() < 0.45) for _ in range(ploidy)]
                truth[s][(chrom, pos)] = hap_gts
                gts.append("/".join(str(g) for g in hap_gts))
            lines.append(
                f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t30\t.\tNS={len(samples)}\tGT\t"
                + "\t".join(gts)
            )
    return "\n".join(header + lines) + "\n", truth


def apply_haplotype(
    genome: dict[str, str],
    vcf_text: str,
    sample: str,
    hap: int,
) -> dict[str, str]:
    """Construct the haplotype sequence of `sample`'s `hap`-th haplotype by
    applying its alleles to the reference."""
    lines = [l for l in vcf_text.splitlines() if l and not l.startswith("##")]
    header = lines[0].split("\t")
    si = header.index(sample)
    out = {}
    edits: dict[str, list[tuple[int, str, str]]] = {c: [] for c in genome}
    for line in lines[1:]:
        f = line.split("\t")
        chrom, pos, ref, alts = f[0], int(f[1]), f[3], f[4].split(",")
        gt = f[si].split(":")[0].replace("|", "/").split("/")[hap]
        if gt == "." or int(gt) == 0:
            continue
        edits[chrom].append((pos, ref, alts[int(gt) - 1]))
    for chrom, seq in genome.items():
        parts = []
        cur = 0
        for pos, ref, alt in sorted(edits[chrom]):
            parts.append(seq[cur : pos - 1])
            parts.append(alt)
            cur = pos - 1 + len(ref)
        parts.append(seq[cur:])
        out[chrom] = "".join(parts)
    return out


def make_reads(
    hap_seqs: list[dict[str, str]],
    rng: np.random.Generator,
    depth: float = 30.0,
    read_len: int = 100,
    error_rate: float = 0.0,
) -> list[str]:
    """Uniform reads over the given haplotype sequences (depth = total over
    all haplotypes).  Returns a list of read strings."""
    reads: list[str] = []
    per_hap_depth = depth / len(hap_seqs)
    for hs in hap_seqs:
        for chrom, seq in hs.items():
            n = len(seq)
            n_reads = int(n * per_hap_depth / read_len)
            starts = rng.integers(0, max(n - read_len, 1), size=n_reads)
            for st in starts:
                r = seq[st : st + read_len]
                if error_rate > 0:
                    chars = list(r)
                    for i in range(len(chars)):
                        if rng.random() < error_rate:
                            chars[i] = _mutate(chars[i], rng)
                    r = "".join(chars)
                # both strands
                if rng.random() < 0.5:
                    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
                    r = "".join(comp[c] for c in reversed(r))
                reads.append(r)
    return reads


def write_fasta(path: str, genome: dict[str, str]) -> None:
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as fh:
        for c, s in genome.items():
            fh.write(f">{c}\n{s}\n")


def write_vcf(path: str, text: str) -> None:
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as fh:
        fh.write(text)


def write_fastq(path: str, reads: list[str]) -> None:
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


def generate_dataset(
    out_dir: str,
    seed: int = 0,
    chrom_lens: dict[str, int] | None = None,
    n_variants: int = 30,
    samples: tuple[str, ...] = ("S1", "S2", "S3"),
    ploidy: int = 2,
    target_sample: str = "S1",
    depth: float = 30.0,
    read_len: int = 100,
    error_rate: float = 0.0,
):
    """Write ref.fa, vars.vcf.gz, reads for target_sample, samples.cfg.

    Returns (paths dict, truth dict for target_sample)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    chrom_lens = chrom_lens or {"chr1": 10000, "chr2": 8000}
    genome = make_genome(rng, chrom_lens)
    vcf_text, truth = make_vcf(
        genome, rng, n_variants_per_chrom=n_variants, samples=samples, ploidy=ploidy
    )
    hap_seqs = [
        apply_haplotype(genome, vcf_text, target_sample, h) for h in range(ploidy)
    ]
    reads = make_reads(hap_seqs, rng, depth=depth, read_len=read_len,
                       error_rate=error_rate)

    paths = {
        "ref": os.path.join(out_dir, "ref.fa"),
        "vcf": os.path.join(out_dir, "vars.vcf.gz"),
        "fq": os.path.join(out_dir, f"{target_sample}.fq.gz"),
        "cfg": os.path.join(out_dir, "samples.cfg"),
    }
    write_fasta(paths["ref"], genome)
    write_vcf(paths["vcf"], vcf_text)
    write_fastq(paths["fq"], reads)
    with open(paths["cfg"], "w") as fh:
        fh.write(f"{target_sample} {paths['fq']}\n")
    return paths, truth[target_sample]
