"""Desktop GUI studio (tkinter): the headless StudioViewModel layer.

Counterpart checks for the reference's PySide6 MangaStudio
(MangaStudioMain.py + MangaStudio_Data/app/ui/main_window.py): job queue
editing incl. duplicate/requeue, schema-generated settings, named
profiles, run/stop control and progress events — all exercised without a
display (the Tk layer is render-only by design)."""
import asyncio
import json
import os
import time
from unittest import mock

import pytest


@pytest.fixture()
def vm(tmp_path, monkeypatch):
    from manga_image_translator_tpu import studio as studio_mod
    from manga_image_translator_tpu import studio_gui
    monkeypatch.setattr(studio_mod, 'PROFILE_DIR', str(tmp_path))
    return studio_gui.StudioViewModel()


def _img(tmp_path, name='a.png'):
    f = tmp_path / name
    f.write_bytes(b'\x89PNG\r\n\x1a\n')
    return str(f)


def test_flatten_schema_covers_config(vm):
    from manga_image_translator_tpu.studio_gui import flatten_schema
    rows = {k: (t, c, d) for k, t, c, d in flatten_schema()}
    # nested pipeline options present as dotted keys
    assert 'translator.translator' in rows
    assert 'detector.detection_size' in rows
    # enums expose their choices for dropdowns
    _t, choices, _d = rows['translator.translator']
    assert 'none' in choices and 'original' in choices
    # plain fields carry their default
    _t, choices, default = rows['detector.detection_size']
    assert choices is None and isinstance(default, int)


def test_queue_add_remove_duplicate_move(vm, tmp_path):
    a, b = _img(tmp_path, 'a.png'), _img(tmp_path, 'b.png')
    assert vm.add_paths([a, b]) is None
    assert vm.add_paths(['/no/such/file.png'])  # error string
    rows = vm.job_rows()
    assert [r['name'] for r in rows] == ['a.png', 'b.png']

    vm.duplicate([0])
    assert [r['name'] for r in vm.job_rows()] == ['a.png', 'b.png', 'a.png']
    # duplicate resets run state
    assert vm.job_rows()[2]['status'] == 'pending'

    assert vm.move(2, -1) is None
    assert [r['name'] for r in vm.job_rows()] == ['a.png', 'a.png', 'b.png']
    assert vm.move(0, -1) == 'out of range'

    assert vm.remove([0, 1]) is None
    assert [r['name'] for r in vm.job_rows()] == ['b.png']
    vm.studio.queue[0]['status'] = 'running'
    assert vm.remove([0]) == 'cannot remove a running job'


def test_add_folder(vm, tmp_path):
    sub = tmp_path / 'chapter'
    sub.mkdir()
    for name in ('2.png', '1.jpg', 'skip.txt'):
        (sub / name).write_bytes(b'x')
    assert vm.add_folder(str(sub)) is None
    assert [r['name'] for r in vm.job_rows()] == ['1.jpg', '2.png']
    assert vm.add_folder(str(tmp_path / 'nope'))
    empty = tmp_path / 'empty'
    empty.mkdir()
    assert vm.add_folder(str(empty)) == 'no images in folder'


def test_requeue_and_history(vm, tmp_path):
    vm.add_paths([_img(tmp_path)])
    job = vm.studio.queue[0]
    job.update(status='done', took=1.25,
               stage_ms={'detection': 21.0, 'ocr': 50.0})
    hist = vm.history_rows()
    assert len(hist) == 1 and 'detection 21ms' in hist[0]['stages']
    vm.requeue([0])
    assert job['status'] == 'pending' and 'took' not in job
    assert vm.history_rows() == []


def test_profile_roundtrip(vm):
    assert vm.set_profile_key('translator.translator', 'none') is None
    assert vm.profile_overrides()['translator.translator'] == 'none'
    # invalid values report and roll back
    assert vm.set_profile_key('detector.detection_size', 'notanumber')
    assert 'detector.detection_size' not in vm.profile_overrides()

    assert vm.save_profile_as('fast') is None
    assert vm.active_profile == 'fast'
    assert 'fast' in vm.profile_names()
    assert vm.switch_profile('default') is None
    assert vm.switch_profile('ghost') == 'unknown profile: ghost'
    assert vm.delete_profile('default') == 'cannot delete the default profile'
    assert vm.delete_profile('fast') is None
    assert 'fast' not in vm.profile_names()

    assert vm.unset_profile_key('translator.translator') is None
    assert vm.unset_profile_key('translator.translator') == 'not set'


def test_job_level_config(vm, tmp_path):
    vm.add_paths([_img(tmp_path)])
    assert vm.set_job_key(0, 'translator.translator', 'none') is None
    assert json.loads(vm.job_config_json(0))['translator']['translator'] \
        == 'none'
    assert vm.set_job_key(0, 'translator.translator', 'not_a_translator')


def test_theme_persists(vm, tmp_path, monkeypatch):
    from manga_image_translator_tpu import studio_gui
    assert vm.toggle_theme() == 'dark'
    fresh = studio_gui.StudioViewModel()
    assert fresh.theme == 'dark'


def test_run_worker_events_and_stop(vm, tmp_path):
    """start() drives the shared engine on a worker thread; progress and
    completion arrive through poll_events; stop() halts between jobs."""
    for name in ('a.png', 'b.png', 'c.png'):
        vm.add_paths([_img(tmp_path, name)])

    seen = []

    class FakeTranslator:
        def __init__(self, *a, **k):
            pass

        def add_progress_hook(self, h):
            self.hook = h

        async def translate_path(self, path, dest, args):
            seen.append(os.path.basename(path))
            await self.hook('detection', False)
            if len(seen) == 1:
                vm.stop()  # requested mid-run: later jobs must not start

    from manga_image_translator_tpu import studio as studio_mod
    with mock.patch.object(studio_mod, 'MangaTranslatorLocal',
                           FakeTranslator):
        assert vm.start() is None
        assert vm.start() == 'already running' or not vm.is_running
        for _ in range(200):
            if not vm.is_running:
                break
            time.sleep(0.01)
    assert not vm.is_running
    assert seen == ['a.png']
    events = vm.poll_events()
    kinds = [e[0] for e in events]
    assert 'progress' in kinds and 'finished' in kinds
    # first job completed, the rest stayed pending
    statuses = [r['status'] for r in vm.job_rows()]
    assert statuses[0] == 'done' and statuses[1:] == ['pending', 'pending']


def test_start_empty_queue(vm):
    assert vm.start() == 'queue empty'


def test_tk_layer_builds_headless():
    """Smoke-build the Tk widget tree when a display is available;
    otherwise assert it is importable (CI has no X server)."""
    from manga_image_translator_tpu import studio_gui
    import tkinter
    try:
        root = tkinter.Tk()
        root.destroy()
    except tkinter.TclError:
        pytest.skip('no display')
    gui = studio_gui.StudioGUI()
    gui._refresh_all()
    gui.root.destroy()
