"""Server-layer tests with a fake in-process executor (the reference never
had these — SURVEY.md §4 calls them out as the gap to close)."""
import asyncio
import io
import json
import struct

import numpy as np
import pytest
from PIL import Image

from manga_image_translator_tpu.server.to_json import (
    TextColor,
    Translation,
    TranslationResponse,
    to_translation,
)
from manga_image_translator_tpu.utils.generic import Context
from manga_image_translator_tpu.utils.textblock import TextBlock


def make_translation():
    return Translation(
        minX=1, minY=2, maxX=30, maxY=40, is_bulleted_list=False,
        angle=0.5, prob=0.9, text_color=TextColor(fg=(0, 0, 0),
                                                  bg=(255, 255, 255)),
        text={'JPN': 'こんにちは', 'ENG': 'hello'},
        background=np.zeros((4, 4, 3), np.uint8))


class TestWireFormat:
    def test_binary_layout_decodes(self):
        """Decode to_bytes() with the struct layout from the reference's
        C++/Rust client decoders (examples/response.cpp)."""
        t = make_translation()
        data = t.to_bytes()
        off = 0
        minx, miny, maxx, maxy = struct.unpack_from('4i', data, off)
        off += 16
        assert (minx, miny, maxx, maxy) == (1, 2, 30, 40)
        (bullet,) = struct.unpack_from('?', data, off)
        off += 1
        assert bullet is False
        angle, prob = struct.unpack_from('2f', data, off)
        off += 8
        assert angle == pytest.approx(0.5)
        assert prob == pytest.approx(0.9)
        fg = struct.unpack_from('3B', data, off)
        off += 3
        bg = struct.unpack_from('3B', data, off)
        off += 3
        assert fg == (0, 0, 0) and bg == (255, 255, 255)
        (n_text,) = struct.unpack_from('i', data, off)
        off += 4
        assert n_text == 2
        texts = {}
        for _ in range(n_text):
            (klen,) = struct.unpack_from('I', data, off)
            off += 4
            key = data[off:off + klen].decode('utf8')
            off += klen
            (vlen,) = struct.unpack_from('I', data, off)
            off += 4
            texts[key] = data[off:off + vlen].decode('utf8')
            off += vlen
        assert texts == {'JPN': 'こんにちは', 'ENG': 'hello'}
        (bglen,) = struct.unpack_from('I', data, off)
        off += 4
        assert bglen == 4 * 4 * 3
        assert off + bglen == len(data)

    def test_response_prefix_count(self):
        resp = TranslationResponse(translations=[make_translation()] * 3)
        data = resp.to_bytes()
        (count,) = struct.unpack_from('i', data, 0)
        assert count == 3

    def test_native_codec_byte_identical(self):
        from manga_image_translator_tpu.server import to_json
        if to_json._native_codec is None:
            pytest.skip('native codec not built')
        resp = TranslationResponse(translations=[make_translation()] * 4)
        assert resp.to_bytes() == resp.to_bytes_python()

    def test_native_codec_roundtrip(self):
        from manga_image_translator_tpu.server import to_json
        codec = to_json._native_codec
        if codec is None:
            pytest.skip('native codec not built')
        t = make_translation()
        resp = TranslationResponse(translations=[t])
        decoded = codec.decode(resp.to_bytes())
        assert len(decoded) == 1
        d = decoded[0]
        assert (d['minX'], d['maxY']) == (1, 40)
        assert d['text']['ENG'] == 'hello'
        assert d['fg'] == (0, 0, 0)
        assert len(d['background']) == 4 * 4 * 3

    def test_to_translation_from_context(self):
        ctx = Context()
        blk = TextBlock([[[10, 10], [90, 10], [90, 40], [10, 40]]],
                        texts=['こんにちは'])
        blk.translation = 'hello'
        blk.target_lang = 'ENG'
        ctx.text_regions = [blk]
        ctx.img_inpainted = np.zeros((100, 100, 3), np.uint8)
        resp = to_translation(ctx)
        assert len(resp.translations) == 1
        t = resp.translations[0]
        assert t.minX == 10 and t.maxY == 40
        assert t.text.get('ENG') == 'hello'
        assert t.background_b64().startswith('data:image/png;base64,')


class TestQueue:
    def test_wait_in_queue_with_fake_executor(self, monkeypatch):
        from manga_image_translator_tpu.server import myqueue
        from manga_image_translator_tpu.server.instance import (
            ExecutorInstance, executor_instances)

        async def fake_sent(self, image, config):
            ctx = Context()
            ctx.result = image
            return ctx

        monkeypatch.setattr(ExecutorInstance, 'sent', fake_sent)
        inst = ExecutorInstance(ip='127.0.0.1', port=9999)
        executor_instances.list = [inst]

        async def run():
            img = Image.new('RGB', (8, 8))
            task = myqueue.QueueElement(None, img, None)
            myqueue.task_queue.add_task(task)
            myqueue.task_queue.update_event()
            return await myqueue.wait_in_queue(task, None)

        ctx = asyncio.run(run())
        assert ctx.result.size == (8, 8)
        assert not inst.busy  # released after completion
        executor_instances.list = []


class TestGatewayEndToEnd:
    def test_gateway_with_inprocess_executor(self, monkeypatch):
        """Full loop: HTTP gateway -> queue -> (faked) executor RPC."""
        from aiohttp.test_utils import TestClient, TestServer
        from manga_image_translator_tpu.server import main as server_main
        from manga_image_translator_tpu.server.instance import (
            ExecutorInstance, executor_instances)

        async def fake_sent(self, image, config):
            ctx = Context()
            ctx.result = image
            ctx.text_regions = []
            return ctx

        monkeypatch.setattr(ExecutorInstance, 'sent', fake_sent)
        executor_instances.list = [ExecutorInstance(ip='x', port=1)]

        async def run():
            app = server_main.build_app()
            async with TestClient(TestServer(app)) as client:
                resp = await client.get('/queue-size')
                assert (await resp.json())['size'] == 0
                buf = io.BytesIO()
                Image.new('RGB', (16, 16), 'white').save(buf, format='PNG')
                resp = await client.post('/translate/image',
                                         data=buf.getvalue())
                assert resp.status == 200
                body = await resp.read()
                img = Image.open(io.BytesIO(body))
                assert img.size == (16, 16)

        asyncio.run(run())
        executor_instances.list = []


class TestStaticPages:
    def test_index_and_manual_pages_served(self):
        import asyncio
        from aiohttp.test_utils import TestClient, TestServer
        from manga_image_translator_tpu.server import main as server_main

        async def run():
            app = server_main.build_app()
            async with TestClient(TestServer(app)) as client:
                resp = await client.get('/')
                assert resp.status == 200
                resp = await client.get('/manual')
                assert resp.status == 200
                text = await resp.text()
                # must target the gateway's framed streaming endpoint
                assert '/translate/with-form/' in text
                assert 'getUint32' in text

        asyncio.run(run())
