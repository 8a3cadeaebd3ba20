"""File + console logger with optional Slack webhook push.

Repaired equivalent of utils/logger.py (the reference wrote to a closed/None
handle, :35-38): timestamped lines to stdout and a per-run logfile; `slack=True`
posts the line to a webhook on a background thread when configured.
"""
from __future__ import annotations

import atexit
import datetime
import json
import os
import threading
import urllib.request
from typing import Optional, TextIO

_file: Optional[TextIO] = None
_slack_url: Optional[str] = None


def init(save_path: str | None = None, slack_webhook_url: str | None = None) -> None:
    """Open a per-run logfile (and optionally configure Slack pushes)."""
    global _file, _slack_url
    close()
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)) or ".", exist_ok=True)
        _file = open(save_path, "a")
    _slack_url = slack_webhook_url or os.environ.get("CRUSE_SLACK_WEBHOOK")


def close() -> None:
    global _file
    if _file is not None:
        _file.close()
        _file = None


atexit.register(close)


def _post_slack(text: str) -> None:
    if not _slack_url:
        return

    def _send():
        try:
            req = urllib.request.Request(
                _slack_url,
                data=json.dumps({"text": text}).encode(),
                headers={"Content-Type": "application/json"},
            )
            urllib.request.urlopen(req, timeout=5)
        except Exception:
            pass  # logging must never take down training

    threading.Thread(target=_send, daemon=True).start()


def log(*args, slack: bool = False) -> None:
    """Timestamped print to stdout + logfile (+ optional Slack)."""
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    line = f"[{stamp}] " + " ".join(str(a) for a in args)
    print(line, flush=True)
    if _file is not None:
        _file.write(line + "\n")
        _file.flush()
    if slack:
        _post_slack(line)


def get_logger():
    return log
