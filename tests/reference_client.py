"""Client for the persistent reference-parser fuzz server (node)."""

from __future__ import annotations

import base64
import json
import shutil
import subprocess
from pathlib import Path

TOOLS = Path(__file__).resolve().parent.parent / "tools" / "goldens"


class ReferenceParser:
    """Runs the actual reference parser in a persistent node subprocess."""

    def __init__(self) -> None:
        self.proc = subprocess.Popen(
            ["node", "--import", str(TOOLS / "register.mjs"), str(TOOLS / "fuzz_server.mjs")],
            cwd=TOOLS,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        self._id = 0

    @staticmethod
    def available() -> bool:
        return shutil.which("node") is not None and Path("/root/reference/src").exists()

    def _roundtrip(self, req: dict) -> dict | None:
        self._id += 1
        req["id"] = self._id
        try:
            self.proc.stdin.write(json.dumps(req) + "\n")
            self.proc.stdin.flush()
            line = self.proc.stdout.readline()
            if not line:
                raise BrokenPipeError
            resp = json.loads(line)
            assert resp["id"] == self._id
            return resp["result"]
        except (BrokenPipeError, OSError):
            # reference crashed internally on this input; restart and report
            self.proc.kill()
            self.__init__()
            return None  # caller treats as "reference crash"

    def parse_string(self, html: str, options: dict | None = None) -> dict | None:
        return self._roundtrip({"string": html, "options": options or {}})

    def parse_bytes(self, data: bytes, options: dict | None = None) -> dict | None:
        return self._roundtrip(
            {"bytes_b64": base64.b64encode(data).decode(), "options": options or {}}
        )

    def close(self) -> None:
        try:
            self.proc.kill()
        except Exception:
            pass
