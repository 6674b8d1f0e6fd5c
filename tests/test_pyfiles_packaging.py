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
