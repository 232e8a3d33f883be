"""WSGI binding for the request surface — the HTTP transport the
reference gets from functions-framework/Flask (main.py:20 takes a Flask
``request``, reads ``request.get_json()``, and returns
``(jsonify(...), status)``), expressed against the PEP-3333 contract
instead so it is runnable AND testable with the stdlib alone
(``wsgiref``) — no web framework exists in this environment, and the
engine gains nothing from depending on one.

`make_wsgi_app` closes over the same (configs, extract, load) triple as
`service.handle_request`; the adapter's only job is transport:

- read the request body (Content-Length-delimited, the WSGI rule),
- parse it as a JSON object (empty body → ``{}``: the documented
  service.py deviation — the reference 500s on a bodyless request only
  because ``.get_json()`` raises, main.py:31-33 / 117-123),
- delegate to ``handle_request`` and serialize its (body, status)
  verbatim as ``application/json``.

Malformed JSON is a client error here (400, with the parse message) —
the reference's blanket try/except maps it to 500 like every other
failure; we keep transport errors distinguishable from batch failures
(500 stays "a config failed", exactly handle_request's contract).

Deploying on any WSGI server (gunicorn, mod_wsgi, Cloud Functions'
functions-framework — itself a WSGI host) is configuration, not code:
``app = make_wsgi_app(...)`` is the entire integration.
"""

from __future__ import annotations

import datetime as dt
import json
from typing import Any, Callable, Iterable, Mapping

from social_warner_spark import logging_util as logu

_STATUS_LINE = {
    200: "200 OK",
    400: "400 Bad Request",
    405: "405 Method Not Allowed",
    500: "500 Internal Server Error",
}


def _read_body(environ: Mapping[str, Any]) -> bytes:
    """The WSGI input rule: read exactly CONTENT_LENGTH bytes (servers
    need not signal EOF on ``wsgi.input``).  A missing length normally
    reads as an empty body — EXCEPT when the host advertises
    ``wsgi.input_terminated`` (gunicorn et al. for chunked
    transfer-encoding, which has no CONTENT_LENGTH): then the stream is
    EOF-safe and must be drained, or a chunked POST's dates would be
    silently ignored in favor of the default batch (ADVICE r07)."""
    try:
        n = int(environ.get("CONTENT_LENGTH") or 0)
    except (TypeError, ValueError):
        n = 0
    if n <= 0:
        if environ.get("wsgi.input_terminated"):
            return environ["wsgi.input"].read()
        return b""
    return environ["wsgi.input"].read(n)


def make_wsgi_app(
    configs: Mapping[str, Any],
    extract: Callable,
    load: Callable,
    anchor: dt.date | None = None,
):
    """Build the WSGI callable wrapping `service.handle_request`.

    POST is the reference's invocation method; GET is accepted with the
    same semantics (a bodyless GET runs the default 7-day batch — Cloud
    Functions HTTP triggers do not restrict the method either).  Other
    methods get 405 without touching the batch."""
    from social_warner_spark.service import handle_request

    def app(environ: Mapping[str, Any], start_response) -> Iterable[bytes]:
        method = environ.get("REQUEST_METHOD", "GET").upper()
        if method not in ("POST", "GET"):
            body: dict = {
                "status": "error",
                "message": f"method {method} not allowed",
            }
            status = 405
        else:
            raw = _read_body(environ)
            if raw.strip():
                try:
                    payload = json.loads(raw)
                    if not isinstance(payload, dict):
                        raise ValueError("request body must be a JSON object")
                except ValueError as exc:  # includes json.JSONDecodeError
                    logu.error("bad request body", error=str(exc))
                    payload = None
                    body = {"status": "error", "message": str(exc)}
                    status = 400
                else:
                    body, status = handle_request(
                        payload, configs, extract, load, anchor
                    )
            else:
                body, status = handle_request(None, configs, extract, load, anchor)
        data = json.dumps(body).encode("utf-8")
        headers = [
            ("Content-Type", "application/json"),
            ("Content-Length", str(len(data))),
        ]
        if status == 405:
            # RFC 7231 §6.5.5: a 405 MUST advertise the allowed methods.
            headers.append(("Allow", "GET, POST"))
        # An unmapped status from handle_request must not turn into an
        # opaque host 500 via KeyError — fall back to a bare reason.
        start_response(
            _STATUS_LINE.get(status, f"{status} Unknown"), headers
        )
        return [data]

    return app
