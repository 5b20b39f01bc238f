"""spark-submit packaging: frontier.zip builds deterministically and
the package imports + runs from the zip alone (zip-safety — what
--py-files shipping to executors requires)."""

import os
import subprocess
import sys


def test_pyfiles_zip_roundtrip(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.build_pyfiles import build

    z1 = str(tmp_path / "a.zip")
    z2 = str(tmp_path / "b.zip")
    n1, n2 = build(z1), build(z2)
    assert n1 == n2 and n1 > 20
    with open(z1, "rb") as a, open(z2, "rb") as b:
        assert a.read() == b.read()  # deterministic: hashable artifact

    # a fresh interpreter, cwd away from the repo, package resolved
    # from the ZIP only — parse an MHTML doc through the kernel
    script = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from frontier.kernel import mime\n"
        "import frontier.kernel.sitemap, frontier.kernel.robots\n"
        "import frontier.kernel.urlnorm, frontier.kernel.simulator\n"
        "doc = (b'From: <x>\\r\\n'"
        " b'Snapshot-Content-Location: https://h.example/p\\r\\n'"
        " b'Content-Type: multipart/related;'"
        " b' boundary=\"B\"\\r\\n\\r\\n'"
        " b'--B\\r\\nContent-Type: text/html\\r\\n'"
        " b'Content-Transfer-Encoding: binary\\r\\n'"
        " b'Content-Location: https://h.example/p\\r\\n\\r\\n'"
        " b'hello\\r\\n--B--\\r\\n')\n"
        "m = mime.parse_mhtml_struct(doc)\n"
        "assert m.resources[0].get_content() == b'hello\\r\\n'\n"
        "print('ZIP-OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", script, z1],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    assert "ZIP-OK" in out.stdout
