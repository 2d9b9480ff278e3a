"""Web viewer API smoke tests (reference L6 equivalent, msv_tpu/viewer.py)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from msv_tpu.io.audio import write_wav


@pytest.fixture()
def viewer_url(tmp_path, rng):
    from http.server import ThreadingHTTPServer

    from msv_tpu.session import MultiTrack
    from msv_tpu.viewer import _Handler, _RWLock

    sr = 8000
    t = np.arange(sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x[None], sr)

    mt = MultiTrack()
    mt.add_tracks([0], [p])
    handler = type("H", (_Handler,), {"session": mt, "lock": _RWLock()})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.read()


def test_viewer_endpoints(viewer_url):
    code, body = _get(viewer_url + "/")
    assert code == 200 and b"msv_tpu viewer" in body

    code, body = _get(viewer_url + "/api/tracks")
    d = json.loads(body)
    assert code == 200 and d["tracks"][0]["sr"] == 8000
    assert d["max_db"] <= 0.0

    code, body = _get(viewer_url + "/api/spec/0?px_per_sec=50&height=100")
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"

    code, body = _get(viewer_url + "/api/wav/0?px_per_sec=50&height=40")
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"

    code, body = _get(viewer_url + "/api/freq/0?rel=1.0")
    assert code == 200
    assert json.loads(body)["hz"] == pytest.approx(4000.0, rel=1e-3)


def test_viewer_error_paths(viewer_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(viewer_url + "/api/spec/99?px_per_sec=50&height=100")
    assert e.value.code == 500
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(viewer_url + "/nope")
    assert e.value.code == 404
    # unknown-track 500s say WHICH track is missing on every endpoint,
    # /api/audio included (it used to 500 with a bare KeyError "0")
    for path in ("/api/audio/99", "/api/spec_crop/99?px_per_sec=50"
                 "&height=100&start=0&end=0.1", "/api/freq/99?rel=0.5"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(viewer_url + path)
        assert e.value.code == 500, path
        body = e.value.read().decode()
        assert "track 99 not found" in body, (path, body)


def test_viewer_audio_and_crop(viewer_url):
    code, body = _get(viewer_url + "/api/audio/0")
    assert code == 200
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"

    code, body = _get(
        viewer_url + "/api/spec_crop/0?px_per_sec=50&height=80&start=0.2&end=0.6"
    )
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"


def test_viewer_wav_crop(viewer_url):
    code, body = _get(
        viewer_url
        + "/api/wav_crop/0?px_per_sec=50&height=40&start=0.2&end=0.6"
    )
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"


def test_viewer_add_remove(viewer_url, tmp_path, rng):
    import json as _json
    import urllib.error

    sr = 8000
    x = (0.3 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    p = str(tmp_path / "b.wav")
    write_wav(p, x[None], sr)

    def post(path, payload):
        req = urllib.request.Request(
            viewer_url + path, data=_json.dumps(payload).encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, _json.loads(r.read())

    code, d = post("/api/add", {"id": 5, "path": p})
    assert code == 200 and d["ok"]
    code, body = _get(viewer_url + "/api/tracks")
    ids = [t["id"] for t in _json.loads(body)["tracks"]]
    assert 5 in ids

    code, d = post("/api/remove", {"id": 5})
    assert code == 200 and d["ok"]
    code, body = _get(viewer_url + "/api/tracks")
    ids = [t["id"] for t in _json.loads(body)["tracks"]]
    assert 5 not in ids

    # error paths: bad file, unknown id
    with pytest.raises(urllib.error.HTTPError):
        post("/api/add", {"id": 6, "path": "/nope.wav"})
    with pytest.raises(urllib.error.HTTPError):
        post("/api/remove", {"id": 99})


def test_viewer_stats(viewer_url):
    import json as _json

    code, body = _get(viewer_url + "/api/stats")
    d = _json.loads(body)
    assert code == 200 and d["tracks"] == 1 and d["sr_cache"] == [8000]


def test_viewer_colormap_export(viewer_url):
    from msv_tpu.render.colormap import COLORMAP

    code, body = _get(viewer_url + "/api/colormap")
    assert code == 200 and len(body) == 30
    assert body == COLORMAP.tobytes()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, r.read()


def test_viewer_setting_roundtrip(viewer_url):
    """Live SpecSetting over HTTP (lib.rs:64-70 surface; VERDICT r1 #8)."""
    code, body = _get(viewer_url + "/api/setting")
    s = json.loads(body)
    assert code == 200 and s["win_ms"] == 40.0 and s["freq_scale"] == "mel"

    code, body = _post(
        viewer_url + "/api/setting",
        {"win_ms": 25.0, "t_overlap": 2, "freq_scale": "linear"},
    )
    assert code == 200 and json.loads(body)["ok"]

    code, body = _get(viewer_url + "/api/setting")
    s = json.loads(body)
    assert s["win_ms"] == 25.0 and s["t_overlap"] == 2
    assert s["freq_scale"] == "linear"
    assert s["db_range"] == 120.0  # untouched fields keep their values

    # tracks were re-derived and renders still work
    code, body = _get(viewer_url + "/api/spec/0?px_per_sec=50&height=100")
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"

    # out-of-range rejected
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        _post(viewer_url + "/api/setting", {"t_overlap": 0})


def test_viewer_add_root_restriction(tmp_path, rng):
    """POST /api/add outside --add-root is rejected with 403."""
    import urllib.error
    from http.server import ThreadingHTTPServer

    from msv_tpu.session import MultiTrack
    from msv_tpu.viewer import _Handler, _RWLock

    sr = 8000
    t = np.arange(sr // 2) / sr
    x = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    allowed = tmp_path / "allowed"
    allowed.mkdir()
    inside = str(allowed / "in.wav")
    outside = str(tmp_path / "out.wav")
    write_wav(inside, x[None], sr)
    write_wav(outside, x[None], sr)

    mt = MultiTrack()
    handler = type("H", (_Handler,), {
        "session": mt, "lock": _RWLock(), "add_root": str(allowed),
    })
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, body = _post(url + "/api/add", {"id": 0, "path": inside})
        assert code == 200
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url + "/api/add", {"id": 1, "path": outside})
        assert ei.value.code == 403
        # traversal attempt
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url + "/api/add",
                  {"id": 2, "path": str(allowed / ".." / "out.wav")})
        assert ei.value.code == 403
    finally:
        srv.shutdown()


def test_viewer_concurrent_renders_and_mutation(viewer_url, tmp_path, rng):
    """Renders must run concurrently (RW lock readers) and stay correct
    while a session mutation (writer) interleaves."""
    import concurrent.futures

    sr = 8000
    t = np.arange(sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    p2 = str(tmp_path / "c.wav")
    write_wav(p2, x[None], sr)

    def render(i):
        code, body = _get(
            viewer_url + f"/api/spec/0?px_per_sec={40 + i}&height=100"
        )
        assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        code, body = _get(
            viewer_url + f"/api/wav/0?px_per_sec={40 + i}&height=40"
        )
        assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        # adaptive path in the concurrent mix (lazy per-scale device
        # constants + per-track caches under the same RW lock)
        code, body = _get(
            viewer_url
            + f"/api/adaptive_crop/0?px_per_sec={40 + i}&height=80"
            + "&start=0.1&end=0.9"
        )
        assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        return True

    def add():
        req = urllib.request.Request(
            viewer_url + "/api/add",
            data=json.dumps({"id": 7, "path": p2}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status

    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        renders = [ex.submit(render, i) for i in range(12)]
        adder = ex.submit(add)
        assert all(f.result(timeout=60) for f in renders)
        assert adder.result(timeout=60) == 200

    # post-mutation state is consistent: both tracks render
    code, body = _get(viewer_url + "/api/tracks")
    d = json.loads(body)
    assert {t["id"] for t in d["tracks"]} == {0, 7}
    code, body = _get(viewer_url + "/api/spec/7?px_per_sec=50&height=100")
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"


def test_serve_viewer_async_startup(tmp_path):
    """serve_viewer binds before the initial load: during loading the API
    answers (tracks -> loading flag, renders -> 503) instead of queueing
    behind the loader's write lock; afterwards everything serves."""
    import json as _json
    import socket
    import time
    import urllib.error

    from msv_tpu.viewer import serve_viewer

    sr = 8000
    t = np.arange(sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x[None], sr)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    th = threading.Thread(
        target=serve_viewer, args=([p], port), daemon=True
    )
    th.start()
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + 60
    body = None
    while time.time() < deadline:
        try:
            _, body = _get(base + "/api/tracks")
            break
        except (urllib.error.URLError, ConnectionError):
            time.sleep(0.2)
    assert body is not None, "server never bound"
    # eventually the loader finishes and the track serves
    while time.time() < deadline:
        d = _json.loads(_get(base + "/api/tracks")[1])
        if d.get("tracks"):
            break
        assert d.get("loading") is True  # pre-ready contract
        time.sleep(0.2)
    status, png = _get(
        base + "/api/wav_crop/0?px_per_sec=50&height=40&start=0.1&end=0.5"
    )
    assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"


def test_viewer_param_bounds(viewer_url):
    """Hostile/typo'd numeric query params must fail the request (500),
    not allocate or poison the session (ADVICE r2)."""
    import urllib.error

    bad = [
        "/api/spec/0?px_per_sec=10000000&height=100",  # > 1e6 cap
        "/api/spec/0?px_per_sec=nan&height=100",
        "/api/spec_crop/0?px_per_sec=50&height=100&start=-5&end=1",
        "/api/spec_crop/0?px_per_sec=50&height=100&start=0&end=1e9",
        "/api/wav/0?px_per_sec=50&height=40&amp_min=-inf&amp_max=1",
        "/api/wav/0?px_per_sec=50&height=-1",
    ]
    for path in bad:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(viewer_url + path)
        assert e.value.code == 500, path
    # sane values still render
    code, body = _get(viewer_url + "/api/spec/0?px_per_sec=50&height=100")
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"


def test_viewer_adaptive_crop(viewer_url):
    """The adaptive endpoint serves a PNG with the same dimensions as the
    standard spec crop of the same window (toggle swaps in place)."""
    import io as _io

    from PIL import Image

    code, body = _get(
        viewer_url
        + "/api/adaptive_crop/0?px_per_sec=50&height=80&start=0.2&end=0.6"
    )
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
    code2, body2 = _get(
        viewer_url
        + "/api/spec_crop/0?px_per_sec=50&height=80&start=0.2&end=0.6"
    )
    a = Image.open(_io.BytesIO(body))
    s = Image.open(_io.BytesIO(body2))
    assert a.size == s.size


def test_viewer_audio_range_requests(viewer_url):
    """/api/audio honors HTTP Range: partial bytes match the same offsets
    of the full file (so the player can seek hour-scale tracks without
    the server materializing the whole PCM)."""
    import urllib.request

    code, full = _get(viewer_url + "/api/audio/0")
    assert code == 200 and full[:4] == b"RIFF"

    def get_range(spec):
        req = urllib.request.Request(
            viewer_url + "/api/audio/0", headers={"Range": f"bytes={spec}"}
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, r.headers.get("Content-Range"), r.read()

    total = len(full)
    # interior range crossing the header/pcm boundary and odd offsets
    st, cr, body = get_range("13-4095")
    assert st == 206 and body == full[13:4096]
    assert cr == f"bytes 13-4095/{total}"
    # open-ended tail
    st, cr, body = get_range(f"{total - 999}-")
    assert st == 206 and body == full[-999:]
    # suffix form
    st, cr, body = get_range("-500")
    assert st == 206 and body == full[-500:]
    # start-at-zero range equals the file prefix
    st, cr, body = get_range("0-43")
    assert st == 206 and body == full[:44]


def test_viewer_audio_malformed_range_gets_200(viewer_url):
    """RFC 7233: an unintelligible Range header is ignored (plain 200),
    not answered with an unsolicited 206."""
    import urllib.request

    req = urllib.request.Request(
        viewer_url + "/api/audio/0", headers={"Range": "bytes=abc"}
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 200
        body = r.read()
    assert body[:4] == b"RIFF"


def test_viewer_freq_mel_param(viewer_url):
    """/api/freq?mel=1 maps the cursor on the mel axis (what the adaptive
    view displays) regardless of the session's frequency scale."""
    import json as _json

    code, body = _get(viewer_url + "/api/freq/0?rel=0.5&mel=1")
    assert code == 200
    hz = _json.loads(body)["hz"]
    # mel midpoint sits well below the linear midpoint of half_sr
    assert 0 < hz < 0.5 * 0.5 * 8000


def test_viewer_query_fuzz_never_kills_server(viewer_url, rng):
    """Hostile/garbage queries may 4xx/5xx but must never wedge the
    server: after 60 random requests, a normal render still succeeds."""
    import urllib.error
    import urllib.request

    paths = ["/api/spec_crop/0", "/api/wav_crop/0", "/api/adaptive_crop/0",
             "/api/freq/0", "/api/spec/0", "/api/wav/0", "/api/audio/0",
             "/api/tracks", "/api/colorbar", "/api/nope/9"]
    keys = ["px_per_sec", "height", "start", "end", "rel", "amp_min",
            "amp_max", "mel", "width", "junk"]

    def rand_val():
        r = rng.integers(0, 6)
        return ["-1", "1e30", "nan", "abc", "0", str(float(rng.normal()))][r]

    for _ in range(60):
        path = paths[int(rng.integers(0, len(paths)))]
        q = "&".join(
            f"{keys[int(rng.integers(0, len(keys)))]}={rand_val()}"
            for _ in range(int(rng.integers(0, 4)))
        )
        url = viewer_url + path + ("?" + q if q else "")
        try:
            with urllib.request.urlopen(url, timeout=60) as r:
                r.read(64)
        except urllib.error.HTTPError as e:
            assert 400 <= e.code < 600
        except urllib.error.URLError as e:  # pragma: no cover
            raise AssertionError(f"server died on {url}: {e}")
    code, body = _get(viewer_url + "/api/spec_crop/0?px_per_sec=50&height=60"
                      "&start=0&end=1")
    assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"


def test_viewer_adaptive_202_and_progress(tmp_path, rng, monkeypatch):
    """A zoomed-out adaptive crop whose background full-dB build hasn't
    covered the viewport answers HTTP 202 + progress JSON (not a stalled
    request), /api/stats surfaces the build, and polling converges to a
    200 PNG once the build lands (VERDICT r3 #4)."""
    import time
    import urllib.error
    from http.server import ThreadingHTTPServer

    from msv_tpu.ops.multires import (adaptive_auto_n_mel,
                                      adaptive_frame_count)
    from msv_tpu.session import MultiTrack
    from msv_tpu.session.multitrack import _AdaptiveBuild
    from msv_tpu.viewer import _Handler, _RWLock

    sr = 8000
    t = np.arange(2 * sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x[None], sr)
    mt = MultiTrack()
    mt.add_tracks([0], [p])
    monkeypatch.setattr(MultiTrack, "ADAPTIVE_MAX_FRAMES", 64)
    monkeypatch.setattr(MultiTrack, "ADAPTIVE_CHUNK", 256)
    handler = type("H", (_Handler,), {"session": mt, "lock": _RWLock()})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    url = (base + "/api/adaptive_crop/0?px_per_sec=30&height=120"
           "&start=0&end=2.5")
    try:
        # a pre-planted never-started build: the endpoint must answer
        # 202 + progress, deterministically (no race with a real build)
        track = mt.tracks[0]
        n_mel = adaptive_auto_n_mel(track.sr, mt.setting)
        nf = adaptive_frame_count(track.n_samples, track.sr, mt.setting)
        fake = _AdaptiveBuild(n_mel, nf)
        mt._adaptive_db[0] = fake
        with urllib.request.urlopen(url, timeout=30) as r:
            assert r.status == 202
            body = json.loads(r.read())
        assert body == {"pending": True, "built": 0, "total": nf}
        st = json.loads(_get(base + "/api/stats")[1])
        assert st["adaptive_builds"] == {"0": {"built": 0, "total": nf}}
        # drop the fake: the next request starts the real background
        # build; polling (what the client JS does on 202) converges
        mt._drop_adaptive(0)
        deadline = time.time() + 60
        png = None
        while time.time() < deadline:
            with urllib.request.urlopen(url, timeout=30) as r:
                if r.status == 200:
                    png = r.read()
                    break
            time.sleep(0.05)
        assert png is not None and png[:4] == b"\x89PNG"
        assert json.loads(_get(base + "/api/stats")[1])[
            "adaptive_builds"] == {}
    finally:
        srv.shutdown()


def test_viewer_render_cache_no_duplicate_renders(tmp_path, rng):
    """VERDICT r3 #5: panning back over a window the server already
    rendered must not re-enter the render pipeline — identical crop
    requests are served byte-identically from the response LRU, and any
    session mutation invalidates it."""
    from http.server import ThreadingHTTPServer

    from msv_tpu.session import MultiTrack
    from msv_tpu.viewer import _Handler, _RWLock

    sr = 8000
    x = (0.4 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(
        np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x[None], sr)
    mt = MultiTrack()
    mt.add_tracks([0], [p])

    calls = {"spec_crop": 0, "wav_crop": 0}
    orig_spec, orig_wav = (MultiTrack.get_spec_image_crop,
                           MultiTrack.get_wav_image_crop)

    class Counting(MultiTrack):
        def get_spec_image_crop(self, *a, **k):
            calls["spec_crop"] += 1
            return orig_spec(self, *a, **k)

        def get_wav_image_crop(self, *a, **k):
            calls["wav_crop"] += 1
            return orig_wav(self, *a, **k)

    mt.__class__ = Counting
    handler = type("H", (_Handler,), {"session": mt, "lock": _RWLock()})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    spec_url = (base + "/api/spec_crop/0?px_per_sec=50&height=80"
                "&start=0.1&end=0.6")
    wav_url = (base + "/api/wav_crop/0?px_per_sec=50&height=40"
               "&amp_min=-1&amp_max=1&start=0.1&end=0.6")
    try:
        # simulated pan-away-and-back: 3 identical fetches -> ONE render
        bodies = [_get(spec_url)[1] for _ in range(3)]
        assert calls["spec_crop"] == 1
        assert bodies[0] == bodies[1] == bodies[2]
        wbodies = [_get(wav_url)[1] for _ in range(3)]
        assert calls["wav_crop"] == 1
        assert wbodies[0] == wbodies[1]
        # a different viewport is a different key
        _get(base + "/api/spec_crop/0?px_per_sec=50&height=80"
             "&start=0.2&end=0.7")
        assert calls["spec_crop"] == 2
        st = json.loads(_get(base + "/api/stats")[1])["render_cache"]
        # 3 unique URLs rendered, 4 repeat fetches served from cache
        assert st["hits"] == 4 and st["misses"] == 3
        # /api/tracks exposes the session generation so OTHER clients can
        # drop their blob LRUs when this one mutates
        gen0 = json.loads(_get(base + "/api/tracks")[1])["gen"]
        # mutation invalidates: the same URL renders fresh (the global dB
        # window may have moved, so cached pixels would be stale)
        _post(base + "/api/setting", {"win_ms": 25.0})
        _get(spec_url)
        assert calls["spec_crop"] == 3
        gen1 = json.loads(_get(base + "/api/tracks")[1])["gen"]
        assert gen1 > gen0
    finally:
        srv.shutdown()


def test_pitch_endpoint(viewer_url):
    """/api/pitch returns the 440 Hz contour with display-space rel
    mirroring /api/freq's mapping, honors bounds, and is cacheable."""
    code, body = _get(viewer_url + "/api/pitch/0?start=0&end=1")
    assert code == 200
    d = json.loads(body)
    assert set(d) == {"t0", "hop_s", "f0", "ap", "rel"}
    assert d["t0"] == 0.0 and len(d["f0"]) == len(d["ap"]) == len(d["rel"])
    f0 = np.array(d["f0"][4:-4])
    ap = np.array(d["ap"][4:-4])
    assert np.median(np.abs(f0 - 440.0)) < 5.0
    assert np.median(ap) < 0.05  # clean tone: confidently voiced
    # rel mirrors the cursor mapping: /api/freq at that rel reads ~f0
    mid = len(d["rel"]) // 2
    code, fbody = _get(viewer_url + f"/api/freq/0?rel={d['rel'][mid]}")
    assert code == 200
    assert json.loads(fbody)["hz"] == pytest.approx(d["f0"][mid], rel=0.01)
    # empty window past the end
    code, body = _get(viewer_url + "/api/pitch/0?start=500&end=501")
    assert code == 200 and json.loads(body)["f0"] == []
    # hostile fmin for the rate -> 500 with a message, not a crash
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(viewer_url + "/api/pitch/0?fmin=3900&fmax=20000")
    assert e.value.code == 500
    # unknown id
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(viewer_url + "/api/pitch/7")
    assert e.value.code == 500


def test_formants_endpoint(viewer_url):
    """/api/formants returns K ordered contours; on a pure 440 Hz tone
    the first formant sits on the tone, rel mirrors /api/freq's mapping,
    and bounds/unknown ids behave like the other overlay endpoints."""
    code, body = _get(viewer_url + "/api/formants/0?start=0&end=1&n=3")
    assert code == 200
    d = json.loads(body)
    assert set(d) == {"t0", "hop_s", "f", "rel"}
    assert len(d["f"]) == len(d["rel"]) and len(d["f"][0]) == 3
    f1 = np.array([r[0] for r in d["f"][4:-4]], np.float64)
    assert np.nanmedian(np.abs(f1 - 440.0)) < 40.0
    # rel mirrors the cursor mapping at the same display position
    mid = len(d["rel"]) // 2
    rel = d["rel"][mid][0]
    if rel is not None:
        code, fbody = _get(viewer_url + f"/api/freq/0?rel={rel}")
        assert json.loads(fbody)["hz"] == pytest.approx(
            d["f"][mid][0], rel=0.02)
    # empty window past the end
    code, body = _get(viewer_url + "/api/formants/0?start=500&end=501")
    assert code == 200 and json.loads(body)["f"] == []
    # unknown id -> 500 with a message
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(viewer_url + "/api/formants/7")
    assert e.value.code == 500
    # the overlay checkbox + canvas are wired in the client
    code, page = _get(viewer_url + "/")
    assert b'id="formants"' in page and b"/api/formants/" in page


def test_pitch_endpoint_smooth(viewer_url):
    """smooth=1 Viterbi-decodes the contour (ops/sequence.py): same
    wire shape, f0 snapped near 440, ap collapsed to a 0/1 mask."""
    code, body = _get(viewer_url + "/api/pitch/0?start=0&end=1&smooth=1")
    assert code == 200
    d = json.loads(body)
    assert set(d) == {"t0", "hop_s", "f0", "ap", "rel"}
    f0 = np.array(d["f0"][4:-4])
    ap = np.array(d["ap"])
    assert np.median(np.abs(f0 - 440.0)) < 15.0  # 25-cent grid snap
    assert set(np.unique(ap)) <= {0.0, 1.0}
    voiced = np.array(d["ap"][4:-4]) == 0.0
    assert voiced.mean() > 0.8


def test_loudness_endpoint(viewer_url):
    """/api/loudness meters the track's mono view; silence returns
    null, unknown ids 500."""
    code, body = _get(viewer_url + "/api/loudness/0")
    assert code == 200
    d = json.loads(body)
    # 0.4 amplitude 440 Hz sine: -0.691 + 10 log10(0.08) + K(440 Hz)
    assert d["lufs"] is not None and -13.0 < d["lufs"] < -9.0
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(viewer_url + "/api/loudness/9")
    assert e.value.code == 500


def test_key_endpoint(viewer_url):
    """/api/key estimates the track's key (a 440 Hz sine reads tonic A);
    unknown ids 500 through the typed-error path."""
    code, body = _get(viewer_url + "/api/key/0")
    assert code == 200
    d = json.loads(body)
    assert d["tonic"] == "A" and d["mode"] in ("major", "minor")
    assert 0.0 < d["r"] <= 1.0
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(viewer_url + "/api/key/9")
    assert e.value.code == 500


def test_render_cache_rejects_stale_generation():
    """A response rendered before a session mutation must not be cached
    under the post-mutation generation (TOCTOU regression: put() used
    to key whatever gen was current at put time)."""
    from msv_tpu.viewer import _RenderCache

    c = _RenderCache()
    g = c.gen
    c.bump_gen()  # a mutation lands while the render was in flight
    c.put("/api/spec/0", "image/png", b"stale", gen=g)
    assert c.get("/api/spec/0") is None
    c.put("/api/spec/0", "image/png", b"fresh", gen=c.gen)
    assert c.get("/api/spec/0") == ("image/png", b"fresh")


def test_onsets_endpoint(tmp_path):
    """/api/onsets finds click times in the viewport window (absolute
    seconds), returns [] for tiny windows, and honors delta."""
    import threading as _t
    from http.server import ThreadingHTTPServer

    from msv_tpu.session import MultiTrack
    from msv_tpu.viewer import _Handler, _RWLock

    sr = 8000
    n = 2 * sr
    x = np.zeros(n, np.float32)
    truth = [0.4, 1.2]
    for tt in truth:
        c = int(tt * sr)
        x[c:c + 24] = 0.8 * np.sin(
            2 * np.pi * 1500 * np.arange(24) / sr).astype(np.float32)
    p = str(tmp_path / "clicks.wav")
    write_wav(p, x[None], sr)
    mt = MultiTrack()
    mt.add_tracks([0], [p])
    handler = type("H", (_Handler,), {"session": mt, "lock": _RWLock()})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    _t.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, body = _get(base + "/api/onsets/0?start=0&end=2")
        assert code == 200
        got = json.loads(body)["t"]
        assert len(got) == 2
        assert abs(got[0] - truth[0]) < 0.05 and abs(got[1] - truth[1]) < 0.05
        # a window holding only the second click reports absolute time
        code, body = _get(base + "/api/onsets/0?start=1.0&end=2.0")
        got = json.loads(body)["t"]
        assert len(got) == 1 and abs(got[0] - truth[1]) < 0.05
        # tiny window -> []
        code, body = _get(base + "/api/onsets/0?start=0&end=0.005")
        assert json.loads(body)["t"] == []
    finally:
        srv.shutdown()


def test_beats_endpoint(tmp_path):
    """/api/beats reports the click train's BPM + a beat grid in absolute
    seconds; sub-second windows return an empty grid."""
    import threading as _t
    from http.server import ThreadingHTTPServer

    from msv_tpu.session import MultiTrack
    from msv_tpu.viewer import _Handler, _RWLock

    sr = 8000
    dur = 6.0
    x = np.zeros(int(dur * sr), np.float32)
    clicks = np.arange(0.25, dur - 0.5, 0.5)  # 120 BPM
    for tt in clicks:
        c = int(tt * sr)
        x[c:c + 64] += 0.8 * np.hanning(64).astype(np.float32)
    p = str(tmp_path / "clicks.wav")
    write_wav(p, x[None], sr)
    mt = MultiTrack()
    mt.add_tracks([0], [p])
    handler = type("H", (_Handler,), {"session": mt, "lock": _RWLock()})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    _t.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, body = _get(base + f"/api/beats/0?start=0&end={dur}")
        assert code == 200
        d = json.loads(body)
        assert abs(d["bpm"] - 120.0) / 120.0 < 0.05
        got = np.asarray(d["t"])
        off = np.abs(got[:, None] - clicks[None, :]).min(axis=1)
        assert np.median(off) <= 0.03
        # a shifted window reports absolute seconds
        code, body = _get(base + "/api/beats/0?start=2.0&end=5.0")
        d2 = json.loads(body)
        assert all(2.0 <= t <= 5.0 for t in d2["t"])
        near = np.abs(np.asarray(d2["t"])[:, None]
                      - clicks[None, :]).min(axis=1)
        assert np.median(near) <= 0.03
        # < 1 s of audio: no meaningful tempo
        code, body = _get(base + "/api/beats/0?start=0&end=0.5")
        d3 = json.loads(body)
        assert d3 == {"bpm": 0.0, "t": []}
    finally:
        srv.shutdown()


def test_notes_endpoint(tmp_path):
    """/api/notes transcribes the viewport window to piano-roll events
    with absolute times and a display 'rel' per note."""
    import threading as _t
    from http.server import ThreadingHTTPServer

    from msv_tpu.session import MultiTrack
    from msv_tpu.viewer import _Handler, _RWLock

    sr = 16000
    t = np.arange(int(0.5 * sr)) / sr
    env = np.minimum(1.0, np.minimum(t, t[::-1]) / 0.01)
    tone = (0.4 * env * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    x = np.concatenate([np.zeros(int(0.3 * sr), np.float32), tone,
                        np.zeros(int(0.3 * sr), np.float32)])
    p = str(tmp_path / "a4.wav")
    write_wav(p, x[None], sr)
    mt = MultiTrack()
    mt.add_tracks([0], [p])
    handler = type("H", (_Handler,), {"session": mt, "lock": _RWLock()})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    _t.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, body = _get(base + "/api/notes/0?start=0&end=1.2")
        assert code == 200
        notes = json.loads(body)["notes"]
        assert len(notes) == 1
        nt = notes[0]
        assert nt["midi"] == 69 and abs(nt["start"] - 0.3) < 0.08
        # default display scale is MEL: rel matches the hz_to_mel map
        from msv_tpu.ops.mel import hz_to_mel

        rel_mel = float(hz_to_mel(np.float32(nt["hz"]))
                        ) / float(hz_to_mel(np.float32(8000.0)))
        assert abs(nt["rel"] - rel_mel) < 1e-3
        # a window starting mid-file reports absolute time
        code, body = _get(base + "/api/notes/0?start=0.2&end=1.2")
        notes = json.loads(body)["notes"]
        assert len(notes) == 1 and abs(notes[0]["start"] - 0.3) < 0.1
        # linear scale (through the endpoint, so the render LRU's
        # generation bumps): rel = hz / (sr/2), below the mel position
        code, _ = _post(base + "/api/setting",
                        {"freq_scale": "linear"})
        assert code == 200
        code, body = _get(base + "/api/notes/0?start=0&end=1.2")
        nlin = json.loads(body)["notes"]
        assert abs(nlin[0]["rel"] - nlin[0]["hz"] / 8000.0) < 1e-3
        assert nlin[0]["rel"] < nt["rel"]
        # forcing mel on a linear session restores the mel mapping
        code, body = _get(base + "/api/notes/0?start=0&end=1.2&mel=1")
        nmel = json.loads(body)["notes"]
        assert abs(nmel[0]["rel"] - rel_mel) < 1e-3
        # tiny window -> []
        code, body = _get(base + "/api/notes/0?start=0&end=0.01")
        assert json.loads(body)["notes"] == []
        # unknown track -> clean 500
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as e:
            _get(base + "/api/notes/9?start=0&end=1")
        assert e.value.code == 500
    finally:
        srv.shutdown()


def test_segments_endpoint(tmp_path):
    """/api/segments reports the tone->noise structure boundary in
    absolute seconds; tiny windows return an empty list."""
    import threading as _t
    from http.server import ThreadingHTTPServer

    from msv_tpu.session import MultiTrack
    from msv_tpu.viewer import _Handler, _RWLock

    sr = 8000
    rng = np.random.default_rng(7)
    t = np.arange(8 * sr) / sr
    x = np.concatenate([
        0.4 * np.sin(2 * np.pi * 440 * t[: 8 * sr]).astype(np.float32),
        0.2 * rng.standard_normal(8 * sr).astype(np.float32),
    ])
    p = str(tmp_path / "twopart.wav")
    write_wav(p, x[None], sr)
    mt = MultiTrack()
    mt.add_tracks([0], [p])
    handler = type("H", (_Handler,), {"session": mt, "lock": _RWLock()})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    _t.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, body = _get(base + "/api/segments/0?start=0&end=16")
        assert code == 200
        d = json.loads(body)
        assert len(d["t"]) >= 1
        assert min(abs(v - 8.0) for v in d["t"]) < 1.5
        # a shifted window reports absolute seconds
        code, body = _get(base + "/api/segments/0?start=4&end=12")
        d2 = json.loads(body)
        assert all(4.0 <= v <= 12.0 for v in d2["t"])
        assert min(abs(v - 8.0) for v in d2["t"]) < 1.5
        # < 4 s of audio: no structure call
        code, body = _get(base + "/api/segments/0?start=0&end=2")
        assert json.loads(body) == {"t": []}
        # unknown id -> clean 500
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as e:
            _get(base + "/api/segments/9")
        assert e.value.code == 500
    finally:
        srv.shutdown()


def test_analyze_endpoint(viewer_url):
    """/api/analyze runs the full report in the background: 202 while
    pending, then 200 with coherent fields; unknown ids 500."""
    import time as _time
    import urllib.error

    deadline = _time.time() + 120
    while True:
        code, body = _get(viewer_url + "/api/analyze/0")
        if code == 200:
            break
        assert code == 202 and json.loads(body)["pending"] is True
        assert _time.time() < deadline, "analysis never finished"
        _time.sleep(0.5)
    d = json.loads(body)
    # 1 s 440 Hz sine fixture: loud, voiced, pitched at 440
    assert abs(d["duration_s"] - 1.0) < 1e-3
    assert d["window_s"] == d["duration_s"]
    assert -13.0 < d["loudness_lufs"] < -9.0
    assert d["voiced_fraction"] > 0.8
    assert abs(d["f0_median_hz"] - 440.0) < 10.0
    assert d["key"]["tonic"] == "A"

    # a finished report serves instantly (no new 202 round)
    code2, body2 = _get(viewer_url + "/api/analyze/0")
    assert code2 == 200 and body2 == body

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(viewer_url + "/api/analyze/7")
    assert e.value.code == 500


def test_align_endpoint(tmp_path, rng):
    """/api/align/<id>?ref=<rid> reports the cross-track offset of two
    takes; bad max_lag and unknown ids 500."""
    import urllib.error
    from http.server import ThreadingHTTPServer

    from msv_tpu.session import MultiTrack
    from msv_tpu.viewer import _Handler, _RWLock

    sr = 8000
    n = 6 * sr
    env = np.abs(np.convolve(rng.standard_normal(n),
                             np.hanning(sr // 2), "same"))
    env /= max(env.max(), 1e-9)
    x = (env * rng.standard_normal(n) * 0.3).astype(np.float32)
    d = int(0.75 * sr)
    b = np.concatenate([np.zeros(d, np.float32), x])[:n]
    pa, pb = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(pa, x[None], sr)
    write_wav(pb, b[None], sr)

    mt = MultiTrack()
    mt.add_tracks([0, 1], [pa, pb])
    handler = type("H", (_Handler,), {"session": mt, "lock": _RWLock()})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # generous timeout: the first align request may compile fresh
        # jit shapes (the suite's 30 s _get default is too tight there)
        with urllib.request.urlopen(url + "/api/align/1?ref=0&max_lag=3",
                                    timeout=300) as resp:
            code, body = resp.status, resp.read()
        assert code == 200
        r = json.loads(body)
        assert abs(r["offset_s"] - 0.75) < 2e-3
        assert r["confidence"] > 0.5 and r["ref"] == 0 and r["id"] == 1
        # self-alignment is ~0
        code, body = _get(url + "/api/align/0?ref=0&max_lag=2")
        assert abs(json.loads(body)["offset_s"]) < 1e-3
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(url + "/api/align/9?ref=0")
        assert e.value.code == 500
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(url + "/api/align/1?ref=0&max_lag=1e9")
        assert e.value.code == 500
    finally:
        srv.shutdown()


def test_process_endpoint(tmp_path, rng):
    """POST /api/process runs denoise/hpss on a loaded track and adds
    the result as a new track (the derived-track 'RX editor' workflow);
    bad ops and unknown ids fail cleanly."""
    import urllib.error
    from http.server import ThreadingHTTPServer

    from msv_tpu.session import MultiTrack
    from msv_tpu.viewer import _Handler, _RWLock

    sr = 8000
    n = 4 * sr
    t = np.arange(n) / sr
    duty = (np.floor(t * 2) % 2 == 0)
    tone = (0.4 * np.sin(2 * np.pi * 440 * t) * duty).astype(np.float32)
    wav = tone + (0.05 * rng.standard_normal(n)).astype(np.float32)
    p = str(tmp_path / "noisy.wav")
    write_wav(p, wav[None], sr)

    mt = MultiTrack()
    mt.add_tracks([0], [p])
    handler = type("H", (_Handler,), {"session": mt, "lock": _RWLock(),
                                      "proc_dir": None})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, body = _post(url + "/api/process", {"id": 0, "op": "denoise"})
        assert code == 200
        r = json.loads(body)
        assert r["ok"] and r["id"] == 1 and r["source"] == 0
        assert set(mt.tracks) == {0, 1}
        # the derived track really is the denoised signal: noise-only
        # half-cycles dropped, same length and rate
        tr = mt._track(1)
        assert tr.sr == sr and tr.n_samples == n
        got = np.asarray(tr.wav_slice(0, n))
        off = slice(sr // 2 + 200, sr - 200)  # inside an off half-cycle
        assert np.std(got[off]) < 0.4 * np.std(wav[off])

        # hpss ops add two more tracks with fresh ids
        code, body = _post(url + "/api/process",
                           {"id": 0, "op": "harmonic"})
        assert code == 200 and json.loads(body)["id"] == 2
        code, body = _post(url + "/api/process",
                           {"id": 0, "op": "percussive", "new_id": 9})
        assert code == 200 and json.loads(body)["id"] == 9
        assert set(mt.tracks) == {0, 1, 2, 9}
        # harmonic + percussive ~ reconstruct the source (default margin)
        hs = np.asarray(mt._track(2).wav_slice(0, n))
        ps = np.asarray(mt._track(9).wav_slice(0, n))
        # 16-bit source quantization + f32 STFT roundtrip tolerance
        src = np.asarray(mt._track(0).wav_slice(0, n))
        assert np.max(np.abs((hs + ps) - src)) < 5e-3

        # colliding new_id must not silently replace an existing track
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url + "/api/process",
                  {"id": 0, "op": "denoise", "new_id": 0})
        assert e.value.code == 500
        assert set(mt.tracks) == {0, 1, 2, 9}  # nothing stomped

        # NMF separation adds K tracks (loudest first) that sum to the
        # source
        code, body = _post(url + "/api/process",
                           {"id": 0, "op": "separate", "components": 2})
        assert code == 200
        r = json.loads(body)
        assert r["ids"] == [10, 11] and r["id"] == 10
        s0 = np.asarray(mt._track(10).wav_slice(0, n))
        s1 = np.asarray(mt._track(11).wav_slice(0, n))
        assert np.max(np.abs((s0 + s1) - src)) < 5e-3
        assert (s0 ** 2).sum() >= (s1 ** 2).sum()
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url + "/api/process",
                  {"id": 0, "op": "separate", "components": 9})
        assert e.value.code == 500
        with pytest.raises(urllib.error.HTTPError) as e:  # multi-output
            _post(url + "/api/process",
                  {"id": 0, "op": "separate", "new_id": 50})
        assert e.value.code == 500
        assert set(mt.tracks) == {0, 1, 2, 9, 10, 11}

        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url + "/api/process", {"id": 0, "op": "reverb"})
        assert e.value.code == 500
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url + "/api/process", {"id": 77, "op": "denoise"})
        assert e.value.code == 500

        # spectral editing: erase the tone's box over [1, 2] s; the
        # derived track loses the tone there but keeps it elsewhere
        code, body = _post(url + "/api/process", {
            "id": 0, "op": "specedit",
            "boxes": [{"t0": 1.0, "t1": 2.0, "f0": 300, "f1": 600,
                       "gain_db": -60}]})
        assert code == 200
        eid = json.loads(body)["id"]
        ed = np.asarray(mt._track(eid).wav_slice(0, n))
        inside = slice(int(1.3 * sr), int(1.45 * sr))  # a tone-on span
        outside = slice(int(0.1 * sr), int(0.3 * sr))
        assert np.std(ed[inside]) < 0.25 * np.std(src[inside])
        assert np.std(ed[outside]) > 0.8 * np.std(src[outside])
        # hostile boxes fail cleanly
        for bad in ([], [{"t0": 0, "t1": 1}],
                    [{"t0": 0, "t1": 1, "f0": 100, "f1": 50}],
                    [{"t0": 0, "t1": 1, "f0": 0, "f1": 100,
                      "mode": "wat"}]):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(url + "/api/process",
                      {"id": 0, "op": "specedit", "boxes": bad})
            assert e.value.code == 500
        # the client ships the edit UI
        code, page = _get(url + "/")
        assert b'id="editmode"' in page and b"'specedit'" in page
    finally:
        srv.shutdown()
