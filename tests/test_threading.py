import asyncio
import time

from manga_image_translator_tpu.utils.threading import PriorityLock, Throttler


def test_priority_lock_orders_waiters():
    order = []

    async def run():
        lock = PriorityLock()
        await lock.acquire(0)

        async def worker(prio, name):
            async with lock(prio):
                order.append(name)

        tasks = [asyncio.create_task(worker(5, 'low')),
                 asyncio.create_task(worker(1, 'high')),
                 asyncio.create_task(worker(3, 'mid'))]
        await asyncio.sleep(0.05)  # let all enqueue
        lock.release()
        await asyncio.gather(*tasks)

    asyncio.run(run())
    assert order == ['high', 'mid', 'low']


def test_throttler_spaces_calls():
    async def run():
        th = Throttler(0.05)
        t0 = time.monotonic()
        for _ in range(3):
            await th.wait()
        return time.monotonic() - t0

    elapsed = asyncio.run(run())
    assert elapsed >= 0.09
