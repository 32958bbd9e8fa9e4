"""Generate the CLI options table for the README from the argparse tree
(counterpart of reference devscripts/make_readme.py)."""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, '.')

from manga_image_translator_tpu.args import parser  # noqa: E402


def options_table(p: argparse.ArgumentParser) -> str:
    lines = ['| Option | Default | Description |', '|---|---|---|']
    for action in p._actions:
        if not action.option_strings or isinstance(
                action, argparse._HelpAction):
            continue
        opts = ', '.join(f'`{o}`' for o in action.option_strings)
        default = '' if action.default in (None, False, argparse.SUPPRESS) \
            else f'`{action.default}`'
        lines.append(f'| {opts} | {default} | {action.help or ""} |')
    return '\n'.join(lines)


def main():
    print('## General options\n')
    print(options_table(parser))
    for name, sub in parser._subparsers._group_actions[0].choices.items():
        print(f'\n## `{name}` mode\n')
        print(options_table(sub))


if __name__ == '__main__':
    main()
