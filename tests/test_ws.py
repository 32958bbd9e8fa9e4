"""WS worker mode: a real local websocket server drives
``MangaTranslatorWS.listen`` through a full page (VERDICT r4 #6 — the last
untested mode). Mirrors the fake-executor style of test_server.py but over
an actual websocket connection, so the connect/read/send flow (including
the websockets>=14 ``additional_headers`` rename) is exercised for real.

Wire-format note: the reference's ``mode/ws.py`` imports a generated
protobuf module (``ws_pb2``) that is NOT checked into its repository, so
its wire schema is unverifiable; this framework speaks a JSON-framed
equivalent (documented divergence, see README)."""
import asyncio
import base64
import io
import json

import numpy as np
import pytest
from PIL import Image

from manga_image_translator_tpu.mode.ws import MangaTranslatorWS


def _page_b64():
    img = Image.fromarray(np.full((64, 64, 3), 255, np.uint8))
    buf = io.BytesIO()
    img.save(buf, format='PNG')
    return base64.b64encode(buf.getvalue()).decode()


@pytest.mark.quick
def test_ws_full_task_roundtrip():
    """Server pushes one new_task; the worker must stream status frames and
    a final result frame holding a PNG."""
    import websockets

    received = []
    done = asyncio.Event()

    async def run():
        async def handler(ws):
            req = ws.request if hasattr(ws, 'request') else None
            if req is not None:
                assert req.headers.get('x-secret') == 's3cret'
            await ws.send(json.dumps({
                'type': 'new_task', 'id': 'task-1',
                'image_b64': _page_b64(),
                # none-detector: full pipeline shell with no model compiles
                'config': {'detector': {'detector': 'none'},
                           'translator': {'translator': 'none',
                                          'target_lang': 'ENG'},
                           'inpainter': {'inpainter': 'none'}},
            }))
            async for raw in ws:
                msg = json.loads(raw)
                received.append(msg)
                if msg['type'] in ('result', 'error'):
                    done.set()
                    return

        async with websockets.serve(handler, '127.0.0.1', 0) as server:
            port = server.sockets[0].getsockname()[1]
            worker = MangaTranslatorWS({'ws_url': f'ws://127.0.0.1:{port}',
                                        'ws_secret': 's3cret',
                                        'use_gpu': False})
            task = asyncio.create_task(worker.listen())
            try:
                await asyncio.wait_for(done.wait(), timeout=120)
            finally:
                task.cancel()
                try:
                    await task
                except (asyncio.CancelledError, Exception):
                    pass

    asyncio.run(run())
    types = [m['type'] for m in received]
    assert types[-1] == 'result', f'frames: {types}'
    assert 'status' in types                      # progress streamed
    result = received[-1]
    assert result['id'] == 'task-1'
    png = base64.b64decode(result['image_b64'])
    out = Image.open(io.BytesIO(png))
    assert out.size == (64, 64)


@pytest.mark.quick
def test_ws_malformed_and_unknown_frames_ignored():
    """Garbage and unknown frame types must not produce replies or crash."""
    ws_mod = MangaTranslatorWS.__new__(MangaTranslatorWS)

    class FakeWS:
        def __init__(self):
            self.sent = []

        async def send(self, raw):
            self.sent.append(raw)

    fake = FakeWS()
    asyncio.run(ws_mod._handle_message(fake, 'not json{{'))
    asyncio.run(ws_mod._handle_message(fake, json.dumps({'type': 'ping'})))
    assert fake.sent == []


@pytest.mark.quick
def test_ws_task_error_reported():
    """A task with an undecodable image must answer with an error frame
    carrying the task id (the worker stays alive)."""
    worker = MangaTranslatorWS({'use_gpu': False})

    class FakeWS:
        def __init__(self):
            self.sent = []

        async def send(self, raw):
            self.sent.append(json.loads(raw))

    fake = FakeWS()
    asyncio.run(worker._handle_message(fake, json.dumps({
        'type': 'new_task', 'id': 'bad-1',
        'image_b64': base64.b64encode(b'not a png').decode(),
        'config': {}})))
    errs = [m for m in fake.sent if m['type'] == 'error']
    assert errs and errs[0]['id'] == 'bad-1'
