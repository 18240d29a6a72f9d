"""`info config print` — config introspection parity (r9 VERDICT item 8).

Reference: `kiara info config print`
(``src/kiara/interfaces/cli/info/commands.py:23-30``) dumps the merged
KiaraConfig.  Here the dump is Spark-free (what a fresh context WOULD
resolve) with per-key provenance, golden-file-checked via a real
subprocess so the output contract can't drift silently.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

GOLDEN = Path(__file__).parent / "resources" / "config_print_golden.txt"
REPO = Path(__file__).resolve().parent.parent


def _run(args, extra_env=None):
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("KIARA_SPARK_")}
    env["KIARA_SPARK_CONTEXTS"] = "/tmp/kiara_golden_ctx"
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, "-m", "kiara_spark.cli", *args],
        capture_output=True, text=True, cwd=str(REPO), env=env)


def test_config_print_matches_golden():
    r = _run(["info", "config", "print"])
    assert r.returncode == 0, r.stderr
    assert r.stdout == GOLDEN.read_text()


def test_config_print_json_and_env_provenance():
    r = _run(["info", "config", "print", "--format", "json"],
             extra_env={"KIARA_SPARK_CACHE": "data_hash",
                        "KIARA_SPARK_RUNTIME_PROFILE": "dharpa",
                        "KIARA_SPARK_BROADCAST_CAP_BYTES": "1024"})
    assert r.returncode == 0, r.stderr
    doc = json.loads(r.stdout)
    rt = doc["runtime"]
    assert rt["job_cache"] == {"value": "data_hash",
                               "source": "env:KIARA_SPARK_CACHE"}
    assert rt["runtime_profile"]["source"] == "env:KIARA_SPARK_RUNTIME_PROFILE"
    assert doc["scale"]["broadcast_cap_bytes"] == {
        "value": "1024", "source": "env:KIARA_SPARK_BROADCAST_CAP_BYTES"}
    # untouched keys keep default provenance
    assert rt["service_socket"]["source"] == "default"
    assert doc["spark"] == {"session": "not_started"}
