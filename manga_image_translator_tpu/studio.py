"""Interactive studio: job queue + profiles on the terminal.

Counterpart of the reference's PySide6 desktop app (MangaStudioMain.py +
MangaStudio_Data/, 3.7k LoC — its own job queue, profiles, themes). TPU
deployments are headless, so this is a terminal front-end over the same
pipeline: named config profiles, a job queue over files/folders, live
per-stage progress, and summary reports.

Run: ``python -m manga_image_translator_tpu.studio``
"""
from __future__ import annotations

import asyncio
import cmd
import json
import os
import time
from typing import Dict, List, Optional

from .config import Config
from .mode.local import MangaTranslatorLocal, load_config_file
from .utils.log import init_logging

PROFILE_DIR = os.path.expanduser('~/.config/manga-image-translator-tpu')


class Studio(cmd.Cmd):
    intro = ('manga-image-translator TPU studio. '
             "Type 'help' for commands.\n")
    prompt = 'studio> '

    def __init__(self):
        super().__init__()
        self.queue: List[Dict] = []
        self.profiles: Dict[str, dict] = {'default': {}}
        self.active_profile = 'default'
        self.dest = 'result-translated'
        self._load_profiles()

    # -- profiles --------------------------------------------------------------
    def _profiles_path(self) -> str:
        return os.path.join(PROFILE_DIR, 'profiles.json')

    def _load_profiles(self):
        try:
            with open(self._profiles_path(), encoding='utf8') as f:
                self.profiles.update(json.load(f))
        except (OSError, ValueError):
            pass

    def _save_profiles(self):
        os.makedirs(PROFILE_DIR, exist_ok=True)
        with open(self._profiles_path(), 'w', encoding='utf8') as f:
            json.dump(self.profiles, f, indent=2)

    def do_profile(self, arg):
        """profile [name]            -- show or switch the active profile
        profile set <key> <value>    -- e.g. profile set translator.translator none
        profile save <name>          -- save current settings as a profile"""
        parts = arg.split()
        if not parts:
            print(f'active: {self.active_profile}')
            print(json.dumps(self.profiles[self.active_profile], indent=2))
            return
        if parts[0] == 'set' and len(parts) >= 3:
            cfg = self.profiles[self.active_profile]
            keys = parts[1].split('.')
            node = cfg
            for k in keys[:-1]:
                node = node.setdefault(k, {})
            value = ' '.join(parts[2:])
            try:
                value = json.loads(value)
            except ValueError:
                pass
            node[keys[-1]] = value
            try:  # validate eagerly
                Config(**cfg)
                print('ok')
            except Exception as e:
                print(f'invalid: {e}')
                del node[keys[-1]]
        elif parts[0] == 'save' and len(parts) == 2:
            self.profiles[parts[1]] = dict(self.profiles[self.active_profile])
            self._save_profiles()
            print(f'saved profile {parts[1]}')
        elif parts[0] in self.profiles:
            self.active_profile = parts[0]
            print(f'switched to {parts[0]}')
        else:
            print(f'unknown profile: {parts[0]} '
                  f'(have: {", ".join(self.profiles)})')

    # -- queue -----------------------------------------------------------------
    def do_add(self, arg):
        """add <path> [path...] -- queue image files or folders"""
        for path in arg.split():
            if not os.path.exists(path):
                print(f'no such path: {path}')
                continue
            self.queue.append({'path': path,
                               'profile': self.active_profile,
                               'status': 'pending'})
            print(f'queued {path} ({self.active_profile})')

    def do_queue(self, arg):
        """queue -- list queued jobs"""
        for i, job in enumerate(self.queue):
            print(f'{i:3d} [{job["status"]:8s}] {job["path"]} '
                  f'({job["profile"]})')

    def do_clear(self, arg):
        """clear -- drop pending jobs"""
        self.queue = [j for j in self.queue if j['status'] == 'done']

    def do_dest(self, arg):
        """dest [folder] -- show or set the output folder"""
        if arg.strip():
            self.dest = arg.strip()
        print(f'output folder: {self.dest}')

    def do_run(self, arg):
        """run -- process the queue"""
        pending = [j for j in self.queue if j['status'] == 'pending']
        if not pending:
            print('queue empty')
            return
        asyncio.run(self._run_jobs(pending))

    async def _run_jobs(self, jobs: List[Dict]):
        translator = MangaTranslatorLocal({'ignore_errors': True})

        async def hook(state, finished):
            print(f'  [{state}]', flush=True)

        translator.add_progress_hook(hook)
        for job in jobs:
            job['status'] = 'running'
            t0 = time.time()
            print(f'== {job["path"]}')
            try:
                cfg = Config(**self.profiles[job['profile']])
                await translator.translate_path(
                    job['path'], self.dest, {'config_file': None})
                job['status'] = 'done'
                print(f'== done in {time.time() - t0:.1f}s')
            except Exception as e:
                job['status'] = 'failed'
                print(f'== failed: {e}')

    def do_quit(self, arg):
        """quit -- exit the studio"""
        return True

    do_exit = do_quit
    do_EOF = do_quit


def main():
    init_logging()
    Studio().cmdloop()


if __name__ == '__main__':
    main()
