"""Live viewer (wcsph_tpu/viewer.py): the ti.GUI analogue — a local MJPEG
stream of on-device-rendered frames (reference loop dfsph.py:595-624).

Pinned here: the HTTP surface (page, single frame, MJPEG stream, stop), the
non-blocking show() contract, and the run_live loop wiring against a real
(tiny) simulation + Canvas."""

import urllib.request

import numpy as np
import pytest

from wcsph_tpu.viewer import LiveViewer, run_live


def _get(url, timeout=10):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.headers, r.read()


@pytest.fixture()
def viewer():
    v = LiveViewer(port=0)           # ephemeral port
    yield v
    v.close()


def test_page_and_frame(viewer):
    status, _, body = _get(viewer.url)
    assert status == 200 and b"wcsph-tpu live" in body

    # no frame yet -> 503
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(viewer.url + "frame.jpg")
    assert e.value.code == 503

    img = np.zeros((32, 48, 3), np.float32)
    img[8:16, 12:24, 0] = 1.0
    viewer.show(img)
    status, headers, body = _get(viewer.url + "frame.jpg")
    assert status == 200
    assert headers["Content-Type"] == "image/jpeg"
    assert body[:2] == b"\xff\xd8"          # JPEG SOI
    # uint8 input accepted too, and seq advances
    viewer.show(np.zeros((32, 48, 3), np.uint8))
    assert viewer._seq == 2


def test_stream_yields_frames(viewer):
    viewer.show(np.full((16, 16, 3), 0.5, np.float32))
    req = urllib.request.urlopen(viewer.url + "stream", timeout=10)
    assert "multipart/x-mixed-replace" in req.headers["Content-Type"]
    head = req.readline()
    assert head.strip() == b"--frame"
    ctype = req.readline()
    assert b"image/jpeg" in ctype
    clen = int(req.readline().split(b":")[1])
    req.readline()                           # blank
    data = req.read(clen)
    assert data[:2] == b"\xff\xd8"
    req.close()


def test_stop_endpoint_flips_running(viewer):
    assert viewer.running
    status, _, body = _get(viewer.url + "stop")
    assert status == 200 and body == b"stopped"
    assert not viewer.running


def test_run_live_loop():
    """run_live drives a real tiny sim + Canvas for max_frames frames."""
    from wcsph_tpu import dam_break, render
    from wcsph_tpu.simulation import Simulation, default_config

    r = 0.025
    sc = dam_break(particle_radius=r, fluid_dims=(4, 4, 4), box_extent=0.35)
    lo, hi = sc.domain(pad=6 * r)
    cfg = default_config("sesph", particle_radius=r, domain_min=lo,
                         domain_max=hi)
    sim = Simulation(sc, cfg, solver="sesph")
    canvas = render.Canvas(64, 64)
    canvas.camera.static_cam(0.0, 0.0, 0.0)

    seen = []
    shown = run_live(sim, canvas, port=0, max_frames=3,
                     frame_cb=lambda s, img: seen.append(img.shape))
    assert shown == 3
    assert seen == [(64, 64, 3)] * 3
    assert float(sim.state.time) > 0.0
