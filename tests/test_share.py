"""Direct tests for the shared-executor RPC mode (mode/share.py): framed
streaming protocol, restricted unpickler, nonce auth, method guards —
previously only exercised indirectly through the gateway fake
(VERDICT r4 weak #4)."""
import asyncio
import pickle

import numpy as np
import pytest

from manga_image_translator_tpu.mode.share import (MangaShare,
                                                   restricted_loads)


def _parse_frames(body: bytes):
    frames = []
    i = 0
    while i < len(body):
        status = body[i]
        ln = int.from_bytes(body[i + 1:i + 5], 'big')
        frames.append((status, body[i + 5:i + 5 + ln]))
        i += 5 + ln
    return frames


@pytest.fixture()
def share():
    s = MangaShare({'nonce': 'secret', 'use_gpu': False})

    async def echo(x=0):
        return {'doubled': x * 2}

    async def boom():
        raise ValueError('intentional')

    async def with_progress(x=0):
        await s.manga._report_progress('stage-one')
        await s.manga._report_progress('stage-two')
        return x + 1

    s.manga.echo = echo
    s.manga.boom = boom
    s.manga.with_progress = with_progress
    return s


def _client(share):
    from aiohttp.test_utils import TestClient, TestServer
    return TestClient(TestServer(share.build_app()))


@pytest.mark.quick
def test_simple_execute_roundtrip(share):
    async def run():
        async with _client(share) as client:
            resp = await client.post(
                '/simple_execute/echo', data=pickle.dumps({'x': 21}),
                headers={'X-Nonce': 'secret'})
            assert resp.status == 200
            result = pickle.loads(await resp.read())
            assert result == {'doubled': 42}
            # lock must be released for the next call
            resp = await client.get('/is_locked')
            assert (await resp.json()) == {'locked': False}
    asyncio.run(run())


@pytest.mark.quick
def test_streaming_execute_frames(share):
    """/execute streams 1-byte status + 4-byte length frames: progress
    frames (status 1) then one result frame (status 0)."""
    async def run():
        async with _client(share) as client:
            resp = await client.post(
                '/execute/with_progress', data=pickle.dumps({'x': 41}),
                headers={'X-Nonce': 'secret'})
            assert resp.status == 200
            frames = _parse_frames(await resp.read())
            statuses = [f[0] for f in frames]
            assert statuses[-1] == 0
            assert 1 in statuses                      # progress streamed
            assert b'stage-one' in [f[1] for f in frames if f[0] == 1][0]
            assert pickle.loads(frames[-1][1]) == 42
    asyncio.run(run())


@pytest.mark.quick
def test_streaming_execute_error_frame(share):
    async def run():
        async with _client(share) as client:
            resp = await client.post(
                '/execute/boom', data=pickle.dumps({}),
                headers={'X-Nonce': 'secret'})
            frames = _parse_frames(await resp.read())
            assert frames[-1][0] == 2                 # error frame
            assert b'intentional' in frames[-1][1]
    asyncio.run(run())


@pytest.mark.quick
def test_nonce_and_method_guards(share):
    async def run():
        async with _client(share) as client:
            resp = await client.post('/simple_execute/echo',
                                     data=pickle.dumps({'x': 1}))
            assert resp.status == 401                 # missing nonce
            resp = await client.post(
                '/simple_execute/__class__', data=pickle.dumps({}),
                headers={'X-Nonce': 'secret'})
            assert resp.status == 403                 # dunder forbidden
            resp = await client.post(
                '/simple_execute/no_such_method', data=pickle.dumps({}),
                headers={'X-Nonce': 'secret'})
            assert resp.status == 404
    asyncio.run(run())


@pytest.mark.quick
def test_restricted_unpickler():
    """Dangerous globals must not unpickle; framework/numpy types must."""
    ok = restricted_loads(pickle.dumps({'a': [1, 2], 'b': np.arange(3)}))
    assert list(ok['b']) == [0, 1, 2]

    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ('true',))

    with pytest.raises(pickle.UnpicklingError):
        restricted_loads(pickle.dumps(Evil()))
