"""CLI surface: the walk commands end-to-end through python -m walk_spark.cli."""

import json
import os
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "PYTHONPATH": REPO}


def run_cli(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "walk_spark.cli", "--cpus", "4", *args],
        capture_output=True, text=True, timeout=600, env=ENV, cwd=REPO,
    )


def test_normalize_url_command():
    out = run_cli("normalize-url", "https://www.A.com/x/../y/index.html#f")
    assert out.returncode == 0
    assert out.stdout.strip() == "http://a.com/y"


@pytest.fixture(scope="module")
def crawl_output(spark):
    """One end-to-end `start` run shared by the read-path command tests."""
    from walk_spark.sources.pages import self_linking_pages
    tmp = tempfile.mkdtemp()
    pages_path = os.path.join(tmp, "pages")
    self_linking_pages(spark).write.parquet(pages_path)
    job = os.path.join(tmp, "job.json")
    from walk_spark.config import CrawlConfig
    with open(job, "w") as f:
        f.write(CrawlConfig(
            seeds=["http://self.test"], domains=["http://self.test"]
        ).to_json())
    out_dir = os.path.join(tmp, "out")
    os.makedirs(out_dir)
    r = run_cli("start", "--job", job, "--pages", pages_path,
                "--output", out_dir)
    assert r.returncode == 0, r.stderr[-2000:]
    return out_dir


def test_start_outputs(crawl_output):
    sm = json.load(open(os.path.join(crawl_output, "sitemap.json")))
    assert set(sm) == {
        "http://self.test", "http://self.test/a.html",
        "http://self.test/b.html", "http://self.test/c.html",
    }
    assert os.path.isdir(os.path.join(crawl_output, "resources"))
    assert os.path.isdir(os.path.join(crawl_output, "order"))


def test_inbound_links_command(crawl_output):
    r = run_cli("inbound-links", os.path.join(crawl_output, "resources"),
                "http://self.test/a.html")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout) == [
        "http://self.test", "http://self.test/a.html",
        "http://self.test/b.html", "http://self.test/c.html",
    ]


def test_clean_command(crawl_output):
    tmp_out = os.path.join(crawl_output, "cleaned.json")
    r = run_cli("clean", os.path.join(crawl_output, "resources"),
                "http://self.test/a", "--output", tmp_out)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["removed"] == 1
    cleaned = json.load(open(tmp_out))
    assert "http://self.test/a.html" not in cleaned
    assert len(cleaned) == 3


def test_inbound_links_from_sitemap_json(crawl_output):
    """S13: the offline commands read a finalized sitemap.json like the
    reference (cmd/inbound_links.go:35-52)."""
    r = run_cli("inbound-links", os.path.join(crawl_output, "sitemap.json"),
                "http://self.test/a.html")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout) == [
        "http://self.test", "http://self.test/a.html",
        "http://self.test/b.html", "http://self.test/c.html",
    ]


def test_clean_from_sitemap_json(crawl_output):
    """S13: clean reads + rewrites a sitemap.json (cmd/clean.go:24-31)."""
    tmp_out = os.path.join(crawl_output, "cleaned_from_sitemap.json")
    r = run_cli("clean", os.path.join(crawl_output, "sitemap.json"),
                "http://self.test/b", "--output", tmp_out)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats == {"total": 4, "removed": 1, "kept": 3}
    cleaned = json.load(open(tmp_out))
    assert "http://self.test/b.html" not in cleaned and len(cleaned) == 3


def test_job_new_command():
    """`walk job new` prints a valid default job JSON (cmd/job.go:16-28)."""
    out = run_cli("job", "new")
    assert out.returncode == 0
    from walk_spark.config import CrawlConfig
    cfg = CrawlConfig.from_json(out.stdout)
    assert cfg.seeds == []
    # round-trips
    assert CrawlConfig.from_json(cfg.to_json()) == cfg


def test_server_command(crawl_output):
    """`walk server` binds the REST shell over a resources table and
    serves /status + /collection (cmd/server.go:9-29; in-process because
    a subprocess server would outlive the test)."""
    import urllib.request
    from walk_spark.cli import main
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "server", os.path.join(crawl_output, "resources"),
            "--walk-id", "w1", "--port", "0", "--no-block",
        ])
    assert rc == 0
    port = json.loads(buf.getvalue())["port"]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/status") as r:
        assert r.status == 200
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/collection") as r:
        body = json.loads(r.read())
    assert body["data"] == ["w1"]
