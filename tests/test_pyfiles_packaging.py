"""spark-submit --py-files deployment unit (north-rule packaging clause):
the zipped engine must be importable WITHOUT the repo on sys.path — i.e. a
bare executor that only received engine.zip can run the validators."""

from __future__ import annotations

import os
import subprocess
import sys


def test_engine_zip_is_self_contained(tmp_path):
    from tools.make_pyfiles import build

    z1 = build(str(tmp_path / "engine.zip"))
    z2 = build(str(tmp_path / "engine2.zip"))
    with open(z1, "rb") as a, open(z2, "rb") as b:
        assert a.read() == b.read()  # reproducible artifact

    # import + run pure-python engine pieces from the zip alone, repo excluded
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        "import numpy as np\n"
        "from engine import flac\n"
        "from engine.suite import audio_clip_suite\n"
        "pcm = np.arange(-500, 500, dtype=np.int16)\n"
        "out = flac.decode(flac.encode(pcm, 8000))\n"
        "assert np.array_equal((out * np.float32(32768.0)).astype(np.int16), pcm)\n"
        "assert len(audio_clip_suite().constraints) == 7\n"
        "print('zip-ok')\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [sys.executable, "-c", code, z1],
        capture_output=True, text=True, timeout=120,
        cwd=str(tmp_path), env=env,  # cwd outside the repo: zip is the only source
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "zip-ok" in r.stdout


def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    """The north rule's ship path, literally: `spark-submit --py-files
    engine.zip engine/runner.py CLIPS TRANSCRIPTS` from a directory outside
    the repo, engine code resolved from the zip alone, full validate()
    verdict table printed by the CLI."""
    import pyspark

    from engine import synth
    from tools.make_pyfiles import build

    clips_p = str(tmp_path / "clips.parquet")
    tr_p = str(tmp_path / "transcripts.parquet")
    synth.gen_clips(spark, 500, partitions=4).write.parquet(clips_p)
    synth.gen_transcripts(spark, 500, partitions=2).write.parquet(tr_p)

    z = build(str(tmp_path / "engine.zip"))
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    assert os.path.exists(submit)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", z,
         os.path.join(repo, "engine", "runner.py"), clips_p, tr_p],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path), env=env,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    # the CLI prints the 10-constraint verdict table
    for name in ("pcm_snr_invariant", "clip_id_unique", "transcript_equality",
                 "container_sr_consistency"):
        assert name in r.stdout, name
