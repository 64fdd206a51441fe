"""Push-to-talk app state machine + inference worker + capture buffer.

The reference has no tests for its app layer (SURVEY §4); these pin the
screen transitions of src/native/app.rs:21-36,216-353 and the worker
protocol of src/native/inference.rs with everything faked.
"""

import time

import numpy as np

from whisper_burn_tpu.app import (
    AppScreen,
    InferenceRequest,
    InferenceWorker,
    PushToTalkApp,
)
from whisper_burn_tpu.audio.capture import AudioCapture, FakeCaptureBackend


def _wait_for(app, screen, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        state = app.update()
        if state.screen is screen:
            return state
        time.sleep(0.005)
    raise AssertionError(f"never reached {screen}, stuck at {app.state.screen}")


def _fake_transcriber(req: InferenceRequest):
    return f"{len(req.audio)} samples @ {req.sample_rate}", 1.5


def _mk_app(present=True, capture=None, download=None):
    return PushToTalkApp(
        model_present=lambda: present,
        load_model=lambda: _fake_transcriber,
        download_model=download,
        capture=capture,
    )


def test_full_record_transcribe_cycle():
    samples = np.linspace(-0.5, 0.5, 4000, dtype=np.float32)
    capture = AudioCapture(FakeCaptureBackend(samples, sample_rate=16_000))
    app = _mk_app(capture=capture)

    assert app.state.screen is AppScreen.CHECK_MODEL
    app.update()
    assert app.state.screen is AppScreen.LOADING_MODEL
    _wait_for(app, AppScreen.READY)

    app.start_recording()
    assert app.state.screen is AppScreen.RECORDING
    app.update()  # drains the capture buffer mid-recording (app.rs:343-353)
    app.stop_recording()
    assert app.state.screen is AppScreen.TRANSCRIBING
    state = _wait_for(app, AppScreen.READY)
    assert state.last_text == "4000 samples @ 16000"
    assert state.last_ms == 1.5
    app.close()


def test_missing_model_goes_to_chooser_and_download_flow():
    calls = []

    def download(progress):
        progress(50, 100)
        calls.append("downloaded")

    app = PushToTalkApp(
        model_present=lambda: len(calls) > 0,  # present only after download
        load_model=lambda: _fake_transcriber,
        download_model=download,
    )
    app.update()
    assert app.state.screen is AppScreen.CHOOSE_MODEL
    app.confirm_download()
    assert app.state.screen is AppScreen.DOWNLOADING
    _wait_for(app, AppScreen.READY)
    assert calls == ["downloaded"]
    assert app.state.download_progress == (50, 100)
    app.close()


def test_download_failure_returns_to_confirm_screen():
    def download(progress):
        raise OSError("network down")

    app = _mk_app(present=False, download=download)
    app.update()
    app.confirm_download()
    state = _wait_for(app, AppScreen.CONFIRM_DOWNLOAD)
    assert "network down" in state.error


def test_load_failure_shows_error_screen():
    def bad_load():
        raise ValueError("corrupt gguf")

    app = PushToTalkApp(model_present=lambda: True, load_model=bad_load)
    app.update()
    state = _wait_for(app, AppScreen.ERROR)
    assert "corrupt gguf" in state.error


def test_inference_error_is_stringified_and_recovers():
    def boom(req):
        raise RuntimeError("device lost")

    worker = InferenceWorker(boom)
    worker.submit(InferenceRequest(np.zeros(10, np.float32), 16_000))
    resp = worker.responses.get(timeout=5)
    assert resp.error == "device lost"
    worker.shutdown()


def test_capture_downmix_and_drain():
    stereo = np.stack(
        [np.ones(100, np.float32), np.zeros(100, np.float32)], axis=1
    )

    class StereoBackend(FakeCaptureBackend):
        def start(self, callback):
            callback(stereo)

    cap = AudioCapture(StereoBackend(np.zeros(0), sample_rate=48_000))
    cap.start()
    got = cap.stop()
    np.testing.assert_allclose(got, np.full(100, 0.5))  # channel mean
    assert cap.take_samples().size == 0  # drained
    assert cap.sample_rate == 48_000
