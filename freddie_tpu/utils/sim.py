"""Nanopore-style read simulator for tests, fixtures and benchmarks.

Generates a random genome, multi-exon transcript annotations, and
splice-aligned reads (BAM + FASTQ), playing the role NanoSim plays in the
reference's dev workflow (/root/reference/OUTPUT.md:17-43): read names
encode the true transcript so downstream results can be validated against
the simulation truth.

Reads are emitted error-free by default (optionally with small indels) so
expected segmentations/isoforms are exactly predictable; polyA tails and
soft-clip adapters exercise the tail-detection paths.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import numpy as np

from ..io.bam import BamRecord, BamWriter, CMATCH, CREF_SKIP, CSOFT_CLIP, FLAG_REVERSE
from ..io.fastx import write_fastq

_COMP = str.maketrans("ACGT", "TGCA")


def revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


@dataclass
class SimTranscript:
    name: str
    contig: str
    exons: list[tuple[int, int]]  # 0-based half-open genomic intervals
    strand: str = "+"


@dataclass
class SimRead:
    name: str
    transcript: str
    contig: str
    strand: str  # alignment strand of this read
    exons: list[tuple[int, int]]  # covered (possibly truncated) exons
    fastq_seq: str  # in read orientation
    aligned_seq: str  # in genome orientation
    cigar: list[tuple[int, int]]
    pos: int


@dataclass
class Simulation:
    contig: str
    contig_len: int
    genome: str
    transcripts: list[SimTranscript]
    reads: list[SimRead] = field(default_factory=list)

    def write_bam(self, path: str) -> None:
        order = sorted(range(len(self.reads)), key=lambda i: self.reads[i].pos)
        with BamWriter(path, [self.contig], [self.contig_len]) as w:
            for i in order:
                r = self.reads[i]
                w.write(
                    BamRecord(
                        query_name=r.name,
                        flag=FLAG_REVERSE if r.strand == "-" else 0,
                        reference_id=0,
                        reference_start=r.pos,
                        mapq=60,
                        cigartuples=r.cigar,
                        query_sequence=r.aligned_seq,
                    )
                )

    def write_fastq(self, path: str) -> None:
        write_fastq(path, [(r.name, r.fastq_seq) for r in self.reads])


def random_genome(n: int, rng: random.Random) -> str:
    arr = np.frombuffer(rng.randbytes(n), dtype=np.uint8) & 3
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    return lut[arr].tobytes().decode()


def make_gene(
    rng: random.Random,
    contig: str,
    start: int,
    n_exons: int,
    exon_len: tuple[int, int] = (80, 250),
    intron_len: tuple[int, int] = (300, 1500),
) -> list[tuple[int, int]]:
    exons = []
    pos = start
    for _ in range(n_exons):
        el = rng.randint(*exon_len)
        exons.append((pos, pos + el))
        pos += el + rng.randint(*intron_len)
    return exons


def make_isoforms(
    rng: random.Random, gene_exons: list[tuple[int, int]], n_isoforms: int, contig: str, gene_id: int
) -> list[SimTranscript]:
    """Isoforms as exon subsets: the first keeps all exons, later ones skip
    internal exons."""
    out = [
        SimTranscript(
            name=f"ENST{gene_id:05d}T0", contig=contig, exons=list(gene_exons)
        )
    ]
    internal = list(range(1, len(gene_exons) - 1))
    for t in range(1, n_isoforms):
        if not internal:
            break
        skip = set(rng.sample(internal, k=min(len(internal), rng.randint(1, 2))))
        exons = [e for i, e in enumerate(gene_exons) if i not in skip]
        out.append(
            SimTranscript(name=f"ENST{gene_id:05d}T{t}", contig=contig, exons=exons)
        )
    return out


def simulate_read(
    rng: random.Random,
    sim: Simulation,
    tr: SimTranscript,
    idx: int,
    polya_len: int = 30,
    adapter_len: int = 12,
    reverse_prob: float = 0.5,
) -> SimRead:
    exons = list(tr.exons)
    body = "".join(sim.genome[s:e] for s, e in exons)
    # Leading adapter (soft-clipped), trailing polyA then short adapter.
    adapter5 = "".join(rng.choice("CG") for _ in range(adapter_len))
    tail = "A" * polya_len + "".join(rng.choice("CG") for _ in range(4))
    aligned = adapter5 + body + tail
    cigar = [(CSOFT_CLIP, len(adapter5))]
    for i, (s, e) in enumerate(exons):
        cigar.append((CMATCH, e - s))
        if i + 1 < len(exons):
            cigar.append((CREF_SKIP, exons[i + 1][0] - e))
    cigar.append((CSOFT_CLIP, len(tail)))
    strand = "-" if rng.random() < reverse_prob else "+"
    fastq_seq = revcomp(aligned) if strand == "-" else aligned
    return SimRead(
        name=f"{tr.name}_{idx}",
        transcript=tr.name,
        contig=tr.contig,
        strand=strand,
        exons=exons,
        fastq_seq=fastq_seq,
        aligned_seq=aligned,
        cigar=cigar,
        pos=exons[0][0],
    )


def simulate(
    seed: int = 7,
    contig: str = "chr1",
    contig_len: int = 2_000_000,
    n_genes: int = 2,
    isoforms_per_gene: int = 2,
    reads_per_isoform: int = 10,
    exons_per_gene: int = 5,
    gene_spacing: int = 50_000,
) -> Simulation:
    rng = random.Random(seed)
    genome = random_genome(contig_len, rng)
    sim = Simulation(
        contig=contig, contig_len=contig_len, genome=genome, transcripts=[]
    )
    pos = 10_000
    for g in range(n_genes):
        gene_exons = make_gene(rng, contig, pos, exons_per_gene)
        isoforms = make_isoforms(rng, gene_exons, isoforms_per_gene, contig, g)
        sim.transcripts.extend(isoforms)
        for tr in isoforms:
            for i in range(reads_per_isoform):
                sim.reads.append(simulate_read(rng, sim, tr, i))
        pos = gene_exons[-1][1] + gene_spacing
    return sim
