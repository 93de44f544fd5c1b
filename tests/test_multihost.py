"""Multi-host scaffolding tests: 2-process CPU run must produce the same
records as the single-process run (SURVEY §4 item d; VERDICT r2 item 6).

Covers per-process round-robin input sharding, the wave-synchronized
cross-process duplicate-signature exchange (global first-seen semantics),
and the deterministic k-way part merge."""

import os
import subprocess
import sys

import numpy as np
import pytest

from speedseq_tpu.formats.bam import read_bam
from speedseq_tpu.formats.fasta import FastaFile
from speedseq_tpu.utils import sim
from speedseq_tpu.align.pipeline import align_fastq, AlignConfig

REF = "/root/reference/example/data/human_g1k_v37_20_42220611-42542245.fasta"
INSERT = (320.0, 50.0, 520, 120)


def _rec_key(r):
    return (r.qname, r.flag, r.tid, r.pos, r.mapq,
            tuple(r.cigar), r.mtid, r.mpos, r.tlen, r.seq)


def test_two_process_record_equality(tmp_path):
    genome = FastaFile(REF).fetch_encoded("20_slice")
    names, s1, q1, s2, q2, truth = sim.simulate_pairs(
        genome[:60000], 300, read_len=100, seed=21)
    # duplicate a pair ACROSS shard boundaries: batch 0 (process 0) and
    # batch 2 (process 0 wave 1) + batch 1 (process 1) — global first-seen
    # marking must match the single-process stream
    for dst, src in ((70, 3), (135, 3), (200, 3)):
        s1[dst], s2[dst], q1[dst], q2[dst] = s1[src], s2[src], q1[src], q2[src]
    fq1, fq2 = str(tmp_path / "m1.fq"), str(tmp_path / "m2.fq")
    sim.to_fastq(fq1, fq2, names, s1, q1, s2, q2)

    cfg = AlignConfig(batch_size=64, insert_override=INSERT)
    single = align_fastq(REF, fq1, fq2, out_prefix=str(tmp_path / "single"),
                         config=cfg)

    exdir = str(tmp_path / "ex")
    procs = []
    # workers run single-device (fast compile); device count does not
    # change records — integer pair-selection penalties keep 1-dev and
    # 8-dev-mesh compiles bit-identical (align.core._device_pair_select)
    env = dict(os.environ, SSQ_FORCE_CPU="1", JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(sys.path))
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "speedseq_tpu.parallel.multihost",
             REF, fq1, fq2, str(tmp_path / "multi"), "2", str(pid),
             exdir, "64", ",".join(str(x) for x in INSERT)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    try:
        outs = [p.communicate(timeout=540) for p in procs]
    finally:
        for p in procs:  # no orphan workers on timeout
            if p.poll() is None:
                p.kill()
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]

    for key in ("bam", "splitters.bam", "discordants.bam"):
        hdr_s, recs_s = read_bam(single[key])
        path_m = str(tmp_path / ("multi." + key))
        assert os.path.exists(path_m), key
        hdr_m, recs_m = read_bam(path_m)
        ks = sorted(map(_rec_key, recs_s))
        km = sorted(map(_rec_key, recs_m))
        assert ks == km, (key, len(ks), len(km))
        # coordinate-sorted
        keyed = [(r.tid if r.tid >= 0 else 1 << 30, r.pos) for r in recs_m]
        assert keyed == sorted(keyed)
    assert os.path.exists(str(tmp_path / "multi.bam.bai"))


def test_two_process_var_record_equality(tmp_path):
    """2-process var (round-robin windows + deterministic part merge)
    must produce a vcf.gz record-identical to the 1-process run
    (VERDICT r3 item 5; reference window fan-out bin/speedseq:719)."""
    import gzip

    from speedseq_tpu.formats.fasta import decode_bases
    from speedseq_tpu.var import run_var
    from speedseq_tpu.var.engine import VarConfig

    genome = FastaFile(REF).fetch_encoded("20_slice")[:30000]
    sub = str(tmp_path / "sub.fa")
    with open(sub, "w") as fh:
        s = decode_bases(genome).decode()
        fh.write(">sub\n" + "\n".join(
            s[i:i + 60] for i in range(0, len(s), 60)) + "\n")
    rng = np.random.default_rng(3)
    hap, variants, coord = sim.mutate(genome, rng, snv_rate=0.002,
                                      indel_rate=0.0003)
    npairs = int(25 * len(genome) / 200)
    names, s1, q1, s2, q2, _ = sim.simulate_pairs(
        genome, npairs, read_len=100, seed=4,
        diploid_genome=hap, coord_map=coord)
    fq1, fq2 = str(tmp_path / "v1.fq"), str(tmp_path / "v2.fq")
    sim.to_fastq(fq1, fq2, names, s1, q1, s2, q2)
    align_fastq(sub, fq1, fq2, out_prefix=str(tmp_path / "v"),
                config=AlignConfig(batch_size=256, sample="S"))
    bam = str(tmp_path / "v.bam")

    # small windows so both processes get several (round-robin over the
    # longest-first order)
    cfg = VarConfig(window_size=4000)
    single = run_var(sub, [bam], str(tmp_path / "single.vcf.gz"),
                     config=cfg)

    exdir = str(tmp_path / "ex")
    out_multi = str(tmp_path / "multi.vcf.gz")
    env = dict(os.environ, SSQ_FORCE_CPU="1", JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(sys.path))
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "speedseq_tpu.parallel.multihost",
             "var", sub, bam, out_multi, "2", str(pid), exdir, "r1",
             "4000"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    try:
        outs = [p.communicate(timeout=540) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]
    # per-process scaling evidence printed (wall-clock + exchange)
    assert any("[var-mh]" in so for so, _ in outs)

    def recs(path):
        with gzip.open(path, "rt") as fh:
            return [l for l in fh if not l.startswith("#")]

    # both runs use window_size=4000 → 8 windows round-robined over the
    # 2 processes; records must be identical line-for-line
    assert recs(out_multi) == recs(single)
    assert os.path.exists(out_multi + ".tbi")


def test_two_process_collective_exchange(tmp_path):
    """With jax.distributed initialized (SSQ_COORDINATOR), the dup
    signature exchange rides process_allgather collectives (Gloo here,
    ICI/DCN on pods) instead of the filesystem — records must still
    equal the single-process run."""
    import socket

    genome = FastaFile(REF).fetch_encoded("20_slice")
    names, s1, q1, s2, q2, truth = sim.simulate_pairs(
        genome[:40000], 200, read_len=100, seed=23)
    for dst, src in ((60, 2), (130, 2)):   # cross-shard duplicates
        s1[dst], s2[dst], q1[dst], q2[dst] = s1[src], s2[src], q1[src], q2[src]
    fq1, fq2 = str(tmp_path / "c1.fq"), str(tmp_path / "c2.fq")
    sim.to_fastq(fq1, fq2, names, s1, q1, s2, q2)
    cfg = AlignConfig(batch_size=64, insert_override=INSERT)
    single = align_fastq(REF, fq1, fq2, out_prefix=str(tmp_path / "sing"),
                         config=cfg)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, SSQ_FORCE_CPU="1", JAX_PLATFORMS="cpu",
               SSQ_COORDINATOR=f"127.0.0.1:{port}",
               PYTHONPATH=os.pathsep.join(sys.path))
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "speedseq_tpu.parallel.multihost",
             REF, fq1, fq2, str(tmp_path / "coll"), "2", str(pid),
             str(tmp_path / "exc"), "64",
             ",".join(str(x) for x in INSERT), "rc"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    try:
        outs = [p.communicate(timeout=540) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]
    # the collective transport must have been selected (no wave files)
    exc = tmp_path / "exc"
    assert not exc.exists() or not any(
        f.startswith("rc.w") for f in os.listdir(exc))
    hdr_s, recs_s = read_bam(single["bam"])
    hdr_m, recs_m = read_bam(str(tmp_path / "coll.bam"))
    assert sorted(map(_rec_key, recs_s)) == sorted(map(_rec_key, recs_m))


def test_two_process_sv_record_equality(tmp_path):
    """2-process sv (per-sample genotyping fan-out + f64 result
    exchange) must produce a vcf.gz record-identical to the 1-process
    run (VERDICT r4 item 4; reference per-sample svtyper loop
    bin/speedseq:1490-1505)."""
    import gzip

    from speedseq_tpu.formats.fasta import decode_bases
    from speedseq_tpu.sv import run_sv, SVConfig
    from speedseq_tpu.sv.engine import SVSample

    g = FastaFile(REF).fetch_encoded("20_slice")[:50000]
    sub = str(tmp_path / "sub.fa")
    with open(sub, "w") as fh:
        s = decode_bases(g).decode()
        fh.write(">sub\n" + "\n".join(
            s[i:i + 60] for i in range(0, len(s), 60)) + "\n")
    DELp, DELl, DUPp, DUPl = 8000, 2500, 35000, 1500
    mutant = np.concatenate([
        g[:DELp], g[DELp + DELl:DUPp + DUPl],
        g[DUPp:DUPp + DUPl], g[DUPp + DUPl:],
    ])
    samples = []
    for k, seed in enumerate((17, 29)):
        npairs = int(25 * len(mutant) / 200)
        names, s1, q1, s2, q2, _ = sim.simulate_pairs(
            mutant, npairs, read_len=100, seed=seed)
        sim.to_fastq(str(tmp_path / f"{k}.1.fq"), str(tmp_path / f"{k}.2.fq"),
                     names, s1, q1, s2, q2)
        align_fastq(sub, str(tmp_path / f"{k}.1.fq"),
                    str(tmp_path / f"{k}.2.fq"),
                    out_prefix=str(tmp_path / f"s{k}"),
                    config=AlignConfig(batch_size=512, sample=f"S{k}",
                                       rg_id=f"rg{k}"))
        samples.append(SVSample(
            f"S{k}", str(tmp_path / f"s{k}.bam"),
            str(tmp_path / f"s{k}.splitters.bam"),
            str(tmp_path / f"s{k}.discordants.bam")))

    # annotate_depth exercises the per-sample CNV fan-out + CN FORMAT
    # exchange (bin/speedseq:1509-1551) across processes too
    svcfg = SVConfig(annotate_depth=True, reference=sub)
    single = run_sv(samples, str(tmp_path / "single.sv.vcf.gz"), svcfg)

    out_multi = str(tmp_path / "multi.sv.vcf.gz")
    env = dict(os.environ, SSQ_FORCE_CPU="1", JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(sys.path))
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    specs = [f"{s.name}:{s.full}:{s.splitters}:{s.discordants}"
             for s in samples]
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "speedseq_tpu.parallel.multihost",
             "sv", out_multi, "2", str(pid), str(tmp_path / "ex"), "rsv"]
            + specs + [f"--depth={sub}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    try:
        outs = [p.communicate(timeout=540) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]
    # per-process timings printed (scaling evidence)
    assert all("[sv-mh]" in so for so, _ in outs)

    def recs(path):
        with gzip.open(path, "rt") as fh:
            return [l for l in fh if not l.startswith("#")]

    assert recs(out_multi) == recs(single)
    assert len(recs(single)) > 0
    assert any("CN" in l.split("\t")[8] for l in recs(single))
    assert os.path.exists(out_multi + ".tbi")
    # readdepth side outputs written by each sample's OWNER process
    base = out_multi[:-7]
    for s_ in ("S0", "S1"):
        assert os.path.exists(f"{base}.{s_}.readdepth.txt"), s_


def test_two_process_reshard_record_equality(tmp_path):
    """Coordinate re-shard mode (SURVEY §2.3 'all-to-all for coordinate
    re-sharding'): every wave's records travel to their genome-range
    owner, each process sorts+compresses ONLY its range, and process 0
    assembles the final BAMs by BGZF-member concatenation — output must
    be record-identical to the single-process run, coordinate-sorted,
    and indexable."""
    genome = FastaFile(REF).fetch_encoded("20_slice")
    names, s1, q1, s2, q2, truth = sim.simulate_pairs(
        genome, 400, read_len=100, seed=31)       # whole-slice spread
    for dst, src in ((80, 5), (150, 5), (260, 5)):  # cross-shard dups
        s1[dst], s2[dst], q1[dst], q2[dst] = s1[src], s2[src], q1[src], q2[src]
    fq1, fq2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    sim.to_fastq(fq1, fq2, names, s1, q1, s2, q2)

    cfg = AlignConfig(batch_size=64, insert_override=INSERT)
    single = align_fastq(REF, fq1, fq2, out_prefix=str(tmp_path / "single"),
                         config=cfg)

    env = dict(os.environ, SSQ_FORCE_CPU="1", JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(sys.path))
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "speedseq_tpu.parallel.multihost",
             REF, fq1, fq2, str(tmp_path / "rsh"), "2", str(pid),
             str(tmp_path / "ex"), "64",
             ",".join(str(x) for x in INSERT), "rr", "reshard"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    try:
        outs = [p.communicate(timeout=540) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]

    for key in ("bam", "splitters.bam", "discordants.bam"):
        hdr_s, recs_s = read_bam(single[key])
        path_m = str(tmp_path / ("rsh." + key))
        hdr_m, recs_m = read_bam(path_m)
        assert sorted(map(_rec_key, recs_s)) == sorted(map(_rec_key, recs_m))
        keyed = [(r.tid if r.tid >= 0 else 1 << 30, r.pos) for r in recs_m]
        assert keyed == sorted(keyed), key
    assert os.path.exists(str(tmp_path / "rsh.bam.bai"))
    # external gzip interop: the concatenated-member BAM must zcat clean
    import gzip

    with gzip.open(str(tmp_path / "rsh.bam"), "rb") as fh:
        assert fh.read(4) == b"BAM\x01"


def test_two_process_somatic_record_equality(tmp_path):
    """2-process somatic (pooled-discrete windows round-robin + SSC
    filter + streaming merge) must be record-identical to the
    single-process run, with the ##INFO SSC header and the GEMINI PED
    emitted by process 0 (reference fan-out bin/speedseq:1059-1077)."""
    import gzip

    from speedseq_tpu.formats.fasta import decode_bases
    from speedseq_tpu.var.somatic import SomaticConfig, run_somatic

    genome = FastaFile(REF).fetch_encoded("20_slice")[:30000]
    sub = str(tmp_path / "sub.fa")
    with open(sub, "w") as fh:
        s = decode_bases(genome).decode()
        fh.write(">sub\n" + "\n".join(
            s[i:i + 60] for i in range(0, len(s), 60)) + "\n")
    rng = np.random.default_rng(5)
    hap, variants, coord = sim.mutate(genome, rng, snv_rate=0.002,
                                      indel_rate=0.0003)
    bams = {}
    for tag, gsrc, hsrc, seed in (("NORMAL", genome, None, 6),
                                  ("TUMOR", genome, hap, 7)):
        npairs = int(20 * len(genome) / 200)
        names, s1, q1, s2, q2, _ = sim.simulate_pairs(
            gsrc, npairs, read_len=100, seed=seed,
            diploid_genome=hsrc, coord_map=coord if hsrc is not None
            else None)
        sim.to_fastq(str(tmp_path / f"{tag}1.fq"),
                     str(tmp_path / f"{tag}2.fq"), names, s1, q1, s2, q2)
        align_fastq(sub, str(tmp_path / f"{tag}1.fq"),
                    str(tmp_path / f"{tag}2.fq"),
                    out_prefix=str(tmp_path / tag),
                    config=AlignConfig(batch_size=256, sample=tag,
                                       rg_id=tag))
        bams[tag] = str(tmp_path / f"{tag}.bam")

    from speedseq_tpu.var.engine import VarConfig
    from speedseq_tpu.var.somatic import somatic_filter

    scfg = SomaticConfig()
    single = run_somatic(sub, bams["NORMAL"], bams["TUMOR"],
                         str(tmp_path / "single.som.vcf.gz"),
                         config=SomaticConfig(
                             caller=scfg.caller))
    # single-process somatic declares the SSC header
    with gzip.open(single, "rt") as fh:
        head = [l for l in fh if l.startswith("#")]
    assert any("ID=SSC" in l for l in head)

    out_multi = str(tmp_path / "multi.som.vcf.gz")
    env = dict(os.environ, SSQ_FORCE_CPU="1", JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(sys.path))
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "speedseq_tpu.parallel.multihost",
             "var", sub, f"{bams['NORMAL']},{bams['TUMOR']}", out_multi,
             "2", str(pid), str(tmp_path / "ex"), "rsom", "somatic",
             "10000"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    try:
        outs = [p.communicate(timeout=540) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]

    def recs(path):
        with gzip.open(path, "rt") as fh:
            return [l for l in fh if not l.startswith("#")]

    # compare against a single-process run at the SAME window size the
    # workers used (run_var with the somatic engine config + SSC filter
    # — exactly what run_somatic/var_multihost drive internally)
    from speedseq_tpu.var import run_var
    single_w = run_var(
        sub, [bams["NORMAL"], bams["TUMOR"]],
        str(tmp_path / "single_w.som.vcf.gz"),
        config=VarConfig(min_qual=0.0, caller=scfg.caller,
                         apply_balance_filter=False, window_size=10_000),
        record_filter=somatic_filter(SomaticConfig(caller=scfg.caller)),
        _somatic_header=True)
    m = recs(out_multi)
    assert m == recs(single_w)
    assert len(m) > 0
    assert all("SSC=" in l for l in m)
    with gzip.open(out_multi, "rt") as fh:
        assert any("ID=SSC" in l for l in fh if l.startswith("#"))
    assert os.path.exists(out_multi[:-len(".vcf.gz")] + ".ped")
