"""REST service (SURVEY §2.1 S8): the engine's interactive entry point.

Re-expresses the reference's service surface
(GrobidMedicalReportRestService.java:82-289, paths
GrobidMedicalReportPaths.java:12-84) over the stdlib ``http.server`` — no
framework dependency — with the same endpoint names:

  GET  /isalive                      -> "true"
  GET  /version                      -> engine version string
  GET  /grobidMedicalReport          -> service description
  POST /processDateline              -> dateline sub-parse (JSON)
  POST /processMedic                 -> medic line sub-parse (JSON)
  POST /processPatient               -> patient lines sub-parse (JSON)
  POST /processNER                   -> generic NER = French medical NER
  POST /processFrenchMedicalNER      -> entities over raw text (JSON)
  POST /processHeaderDocument        -> header struct of one span-doc (JSON)
  POST /processLeftNoteDocument      -> left-note struct of one span-doc
  POST /processFullMedicalText       -> full extraction -> TEI XML
  POST /processBatch                 -> N span-docs -> span table (uses the
                                        Spark session when one is attached,
                                        else the in-process kernel)
  POST /annotatePDF, /processFullMedicalTextAssetDocument -> 501 (PDF parse
        is upstream of the engine's north-rule input, SURVEY §2.1)

Document payloads are the north-rule input shape:
``{"doc_id": ..., "spans": [{kind,text,media_ref,offset}, ...]}`` (layout
attrs accepted when present). Single-doc endpoints run the fused kernel
in-process (request latency path); /processBatch routes through the same
``plans.pipeline.extract`` stage the batch jobs use when a SparkSession is
attached to the server.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs

VERSION = "0.2.0"
DESCRIPTION = ("PySpark-native medical-report extraction engine — "
               "REST surface mirroring grobid-medical-report's service "
               "paths over the interleaved span input shape.")

_NOT_IMPLEMENTED = {
    "/annotatePDF", "/processFullMedicalTextAssetDocument",
}


def _extract_one(doc: dict[str, Any]) -> dict[str, Any]:
    from .operators.assemble import extract_doc

    return extract_doc(str(doc.get("doc_id", "")), doc.get("spans") or [])


def _handle(path: str, payload: dict[str, Any],
            spark=None) -> tuple[int, dict[str, Any] | str]:
    """Route one request. Returns (status, JSON-able body or raw string)."""
    from .functions.tei import render_tei
    from .operators.header import parse_header_zone
    from .operators.leftnote import parse_leftnote_zone
    from .operators.ner import extract_entities

    if path in _NOT_IMPLEMENTED:
        return 501, {"error": "PDF ingestion is upstream of this engine "
                              "(north-rule input is pre-parsed spans)"}
    if path == "/processDateline":
        h = parse_header_zone([payload.get("dateline", "")])
        return 200, {"datelines": h["datelines"]}
    if path == "/processMedic":
        h = parse_header_zone([payload.get("medic", "")])
        return 200, {"medics": h["medics"],
                     "person_names": h["person_names"]}
    if path == "/processPatient":
        lines = payload.get("patient", "")
        h = parse_header_zone(lines.split("\n") if isinstance(lines, str)
                              else list(lines))
        return 200, {"patients": h["patients"],
                     "person_names": h["person_names"]}
    if path in ("/processNER", "/processFrenchMedicalNER"):
        text = payload.get("text", payload.get("ner", ""))
        return 200, {"entities": extract_entities(text)}
    if path == "/processHeaderDocument":
        r = _extract_one(payload)
        return 200, {"status": r["status"], "header": r["header"],
                     "medics": r["medics"], "patients": r["patients"]}
    if path == "/processLeftNoteDocument":
        r = _extract_one(payload)
        return 200, {"status": r["status"], "leftnote": r["leftnote"]}
    if path == "/processFullMedicalText":
        r = _extract_one(payload)
        if r["status"] != "ok":
            return 422, {"status": r["status"]}
        return 200, render_tei(r)
    if path == "/processBatch":
        docs = payload.get("docs", [])
        if spark is not None:
            from .plans.pipeline import extract, result_spans

            df = spark.createDataFrame(
                [(d.get("doc_id", ""),
                  [(s["kind"], s["text"], s["media_ref"], s["offset"])
                   for s in (d.get("spans") or [])]) for d in docs],
                "doc_id string, spans array<struct<kind:string,text:string,"
                "media_ref:string,offset:int>>")
            rows = result_spans(extract(df)).collect()
            return 200, {"spans": [r.asDict() for r in rows]}
        out = []
        for d in docs:
            r = _extract_one(d)
            for s in r["spans"]:
                out.append({"doc_id": r["doc_id"], **s})
        return 200, {"spans": out}
    return 404, {"error": f"unknown path {path}"}


class _Handler(BaseHTTPRequestHandler):
    server_version = f"grobid-medical-report-spark/{VERSION}"

    def log_message(self, *args) -> None:  # quiet test runs
        pass

    def _send(self, status: int, body: Any,
              content_type: str = "application/json") -> None:
        raw = (body if isinstance(body, (bytes,)) else
               body.encode() if isinstance(body, str) else
               json.dumps(body, ensure_ascii=False).encode())
        if isinstance(body, str):
            content_type = "application/xml" \
                if body.startswith("<?xml") else "text/plain"
        self.send_response(status)
        self.send_header("Content-Type", f"{content_type}; charset=utf-8")
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)

    def do_GET(self) -> None:
        if self.path == "/isalive":
            self._send(200, "true")
        elif self.path == "/version":
            self._send(200, VERSION)
        elif self.path == "/grobidMedicalReport":
            self._send(200, DESCRIPTION)
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self) -> None:
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n).decode("utf-8", errors="replace")
        ctype = self.headers.get("Content-Type", "")
        if "json" in ctype:
            try:
                payload = json.loads(raw) if raw else {}
            except json.JSONDecodeError as exc:
                self._send(400, {"error": f"bad JSON: {exc}"})
                return
        else:  # form-encoded, like the reference's @FormParam endpoints
            payload = {k: v[0] for k, v in parse_qs(raw).items()}
        try:
            status, body = _handle(self.path, payload,
                                   spark=self.server.spark)  # type: ignore
        except Exception as exc:  # per-request isolation (S3 analog)
            status, body = 500, {"error": f"{type(exc).__name__}: {exc}"}
        self._send(status, body)


class MedicalReportServer(ThreadingHTTPServer):
    """The service host; ``spark`` optionally attaches a SparkSession for
    the /processBatch distributed path."""

    daemon_threads = True

    def __init__(self, port: int = 8070, spark=None):
        super().__init__(("127.0.0.1", port), _Handler)
        self.spark = spark


def serve(port: int = 8070, spark=None,
          background: bool = False) -> MedicalReportServer:
    srv = MedicalReportServer(port=port, spark=spark)
    if background:
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    else:
        srv.serve_forever()
    return srv
