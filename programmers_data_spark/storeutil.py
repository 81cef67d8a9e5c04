"""Shared-artifact store locations — safe defaults for the published
intermediate tables that composition queries read (the verified
near-dup pair store, the JSONL interchange store).

Two requirements the naive ``$TMPDIR/fixed_name`` default violates:

- multi-user hosts: a fixed, predictable path under the WORLD-WRITABLE
  shared tempdir lets another user pre-create the directory and plant
  an artifact that consumers would serve unverified (r8 ADVICE). The
  default is therefore per-uid and created mode 0700, and an existing
  base is rejected unless the current user owns it and it is not
  writable by others.
- reproducibility: callers (bench.py, the driver) can still pin an
  explicit base via an env var — an operator-chosen location is
  trusted as given, like any configured warehouse path.
"""

from __future__ import annotations

import os
import stat
import tempfile


def store_base(env_var: str, name: str) -> str:
    """Resolve the base directory for a named shared-artifact store.

    ``env_var`` overrides unconditionally (operator-owned location).
    Otherwise default to ``$TMPDIR/<name>_u<uid>``, created 0700;
    refuse a pre-existing default the current user does not own or
    that other users can write, instead of silently trusting planted
    content.
    """
    override = os.environ.get(env_var)
    if override:
        return override
    base = os.path.join(
        tempfile.gettempdir(), f"{name}_u{os.getuid()}"
    )
    try:
        os.makedirs(base, mode=0o700)
    except FileExistsError:
        st = os.stat(base)
        if st.st_uid != os.getuid():
            raise PermissionError(
                f"shared-artifact store {base} is owned by uid "
                f"{st.st_uid}, not the current user — refusing to "
                f"serve its content; set ${env_var} to a trusted path"
            )
        if st.st_mode & (stat.S_IWGRP | stat.S_IWOTH):
            raise PermissionError(
                f"shared-artifact store {base} is group/other-"
                f"writable — refusing to serve its content; "
                f"chmod 0700 it or set ${env_var}"
            )
    return base
