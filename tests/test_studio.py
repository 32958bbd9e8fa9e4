"""Terminal studio: profiles, per-job config snapshots, queue editing and
persistence (reference MangaStudio job-management parity)."""
import json
import os

import pytest


@pytest.fixture()
def studio(tmp_path, monkeypatch):
    from manga_image_translator_tpu import studio as studio_mod
    monkeypatch.setattr(studio_mod, 'PROFILE_DIR', str(tmp_path))
    return studio_mod.Studio()


def test_profile_set_validates_and_persists(studio, capsys):
    studio.do_profile('set translator.translator none')
    assert 'ok' in capsys.readouterr().out
    studio.do_profile('set detector.detection_size notanumber')
    out = capsys.readouterr().out
    assert 'invalid' in out
    # the bad value was rolled back
    assert 'detection_size' not in studio.profiles['default'].get(
        'detector', {})
    studio.do_profile('save fast')
    assert studio.profiles['fast']['translator']['translator'] == 'none'
    path = os.path.join(studio._path('profiles.json'))
    assert json.load(open(path))['fast']


def test_profile_delete_and_switch(studio, capsys):
    studio.do_profile('save other')
    studio.do_profile('other')
    assert studio.active_profile == 'other'
    studio.do_profile('delete other')
    assert studio.active_profile == 'default'
    studio.do_profile('delete default')
    assert 'cannot delete' in capsys.readouterr().out


def test_jobs_snapshot_their_profile(studio, tmp_path, capsys):
    img = tmp_path / 'page.png'
    img.write_bytes(b'\x89PNG\r\n\x1a\n')
    studio.do_profile('set translator.translator none')
    studio.do_add(str(img))
    # changing the profile after queueing must NOT change the queued job
    studio.do_profile('set translator.translator original')
    job = studio.queue[0]
    assert job['config']['translator']['translator'] == 'none'
    cfg = studio._job_config(job)
    assert cfg.translator.translator.value == 'none'


def test_queue_editing_and_persistence(studio, tmp_path, capsys):
    files = []
    for name in ('a.png', 'b.png', 'c.png'):
        f = tmp_path / name
        f.write_bytes(b'\x89PNG\r\n\x1a\n')
        files.append(str(f))
    studio.do_add(' '.join(files))
    assert len(studio.queue) == 3
    studio.do_move('0 2')
    assert studio.queue[2]['path'].endswith('a.png')
    studio.do_remove('1')
    assert len(studio.queue) == 2
    studio.queue[0]['status'] = 'failed'
    studio.queue[0]['error'] = 'boom'
    studio.do_retry('')
    assert studio.queue[0]['status'] == 'pending'
    assert 'error' not in studio.queue[0]

    # a fresh studio over the same state dir resumes the queue
    from manga_image_translator_tpu import studio as studio_mod
    studio._save_queue()
    fresh = studio_mod.Studio()
    assert len(fresh.queue) == 2

    # crashed 'running' jobs come back as pending
    studio.queue[0]['status'] = 'running'
    studio._save_queue()
    fresh2 = studio_mod.Studio()
    assert fresh2.queue[0]['status'] == 'pending'


def test_clear_keeps_pending(studio, tmp_path):
    f = tmp_path / 'a.png'
    f.write_bytes(b'\x89PNG\r\n\x1a\n')
    studio.do_add(str(f))
    studio.queue.append({'path': 'x', 'profile': 'default',
                         'status': 'done'})
    studio.do_clear('')
    assert [j['status'] for j in studio.queue] == ['pending']


def test_job_level_config_editing(studio, tmp_path, capsys):
    """Per-job pipeline editing (reference MangaStudio edits job pipelines
    independently of profiles and other jobs)."""
    img = tmp_path / 'a.png'
    img.write_bytes(b'x')
    studio.do_add(str(img))
    studio.do_add(str(img))
    studio.do_job(f'0 set translator.translator none')
    out = capsys.readouterr().out
    assert 'ok' in out
    assert studio.queue[0]['config']['translator']['translator'] == 'none'
    # the other job and the profile stay untouched
    assert 'translator' not in studio.queue[1]['config']
    assert 'translator' not in studio.profiles['default']
    # invalid values roll back
    studio.do_job('0 set translator.translator not_a_translator')
    assert 'invalid' in capsys.readouterr().out
    assert studio.queue[0]['config']['translator']['translator'] == 'none'
    # unset removes the override
    studio.do_job('0 unset translator.translator')
    assert studio.queue[0]['config']['translator'] == {}
    # persisted
    with open(os.path.join(str(tmp_path), 'queue.json'),
              encoding='utf8') as f:
        assert json.load(f)[0]['config']['translator'] == {}


def test_status_surfaces_stage_timers(studio, tmp_path, capsys):
    img = tmp_path / 'b.png'
    img.write_bytes(b'x')
    studio.do_add(str(img))
    studio.queue[0]['status'] = 'done'
    studio.queue[0]['stage_ms'] = {'detection': 22.5, 'ocr': 48.0}
    studio.do_status('')
    out = capsys.readouterr().out
    assert 'done:1' in out
    assert 'detection 22ms' in out or 'detection 23ms' in out
    assert 'mean per stage' in out


def test_run_hook_collects_stage_times(studio, tmp_path):
    """The progress-channel 'stage-time:' frames land in the running job's
    stage_ms dict (wiring check without a real pipeline)."""
    import asyncio
    from unittest import mock
    img = tmp_path / 'c.png'
    img.write_bytes(b'x')
    studio.do_add(str(img))

    captured_hooks = []

    class FakeTranslator:
        def __init__(self, *a, **k):
            pass

        def add_progress_hook(self, h):
            captured_hooks.append(h)

        async def translate_path(self, path, dest, args):
            for h in captured_hooks:
                await h('stage-time:detection:21.0', False)
                await h('stage-time:ocr:50.5', False)

    from manga_image_translator_tpu import studio as studio_mod
    with mock.patch.object(studio_mod, 'MangaTranslatorLocal',
                           FakeTranslator):
        asyncio.run(studio._run_jobs([studio.queue[0]]))
    assert studio.queue[0]['stage_ms'] == {'detection': 21.0, 'ocr': 50.5}
    assert studio.queue[0]['status'] == 'done'
