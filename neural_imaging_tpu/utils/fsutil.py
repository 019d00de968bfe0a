"""
Filesystem helpers (parity with reference helpers/fsutil.py).
"""
import os
import re


def listdir(dirname, pattern=None, dirs_only=False):
    """List entries of a directory optionally filtered by a regex; sorted."""
    entries = sorted(os.listdir(dirname))
    if dirs_only:
        entries = [e for e in entries if os.path.isdir(os.path.join(dirname, e))]
    if pattern is not None:
        rx = re.compile(pattern)
        entries = [e for e in entries if rx.match(e)]
    return entries


def split(path):
    """Split a path into all of its components."""
    parts = []
    while True:
        head, tail = os.path.split(path)
        if tail:
            parts.insert(0, tail)
        if head == path:
            if head:
                parts.insert(0, head)
            break
        path = head
    return parts


def strip_prefix(path, prefix):
    path = os.path.normpath(path)
    prefix = os.path.normpath(prefix)
    if path.startswith(prefix):
        return path[len(prefix):].lstrip(os.sep)
    return path


def sanitize(name, replacement='_'):
    """Sanitize a string for use as a file/directory name."""
    return re.sub(r'[^\w.+-]', replacement, str(name))
