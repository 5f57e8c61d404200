package graft.server

/** Static query UI served at `GET /` (reference parity surface:
  * `frontend/index.html` + `frontend/app.js` — a textarea that submits
  * to `GET /query` and prints the SPARQL-Results-JSON; behavior
  * re-implemented, not copied). Ours renders SELECT results as a
  * table from `head.vars` × `results.bindings`, falls back to raw
  * JSON for ASK/CONSTRUCT, uses a relative fetch URL so the page
  * works on whatever host/port serves it, and reports query wall
  * time. Embedded as a string so the server stays a single artifact
  * with no resource-file loading.
  */
object Frontend {

  val indexHtml: String =
    """<!DOCTYPE html>
      |<html lang="en">
      |<head>
      |<meta charset="UTF-8">
      |<meta name="viewport" content="width=device-width, initial-scale=1">
      |<title>Graft SPARQL</title>
      |<style>
      |  body { font-family: system-ui, sans-serif; margin: 0 auto; max-width: 60em; padding: 1.5em; }
      |  textarea { width: 100%; height: 10em; font-family: monospace; font-size: 0.95em;
      |             box-sizing: border-box; }
      |  button { margin-top: 0.5em; padding: 0.4em 1.2em; }
      |  #status { margin-left: 1em; color: #666; }
      |  table { border-collapse: collapse; margin-top: 1em; width: 100%; }
      |  th, td { border: 1px solid #ccc; padding: 0.3em 0.6em; text-align: left;
      |           font-family: monospace; font-size: 0.9em; }
      |  th { background: #eee; }
      |  pre { background: #f6f6f6; padding: 1em; overflow-x: auto; }
      |  .err { color: #a00; }
      |</style>
      |</head>
      |<body>
      |<h1>Graft SPARQL</h1>
      |<form id="f">
      |<textarea id="q" spellcheck="false"
      |  placeholder="SELECT ?s ?p ?o WHERE { ?s ?p ?o } LIMIT 10"></textarea><br>
      |<button type="submit">Run</button><span id="status"></span>
      |</form>
      |<div id="out"></div>
      |<script>
      |const form = document.getElementById('f');
      |const out = document.getElementById('out');
      |const status = document.getElementById('status');
      |function cell(b) {
      |  if (b === undefined) return '';
      |  let v = b.value;
      |  if (b.type === 'uri') v = '<' + v + '>';
      |  if (b['xml:lang']) v += '@' + b['xml:lang'];
      |  return v;
      |}
      |function render(json) {
      |  if (json.head && json.head.vars && json.results) {
      |    const vars = json.head.vars;
      |    const tbl = document.createElement('table');
      |    const hr = tbl.insertRow();
      |    vars.forEach(v => { const th = document.createElement('th');
      |                        th.textContent = '?' + v; hr.appendChild(th); });
      |    json.results.bindings.forEach(row => {
      |      const tr = tbl.insertRow();
      |      vars.forEach(v => { tr.insertCell().textContent = cell(row[v]); });
      |    });
      |    out.replaceChildren(tbl);
      |  } else {
      |    const pre = document.createElement('pre');
      |    pre.textContent = JSON.stringify(json, null, 2);
      |    out.replaceChildren(pre);
      |  }
      |}
      |form.addEventListener('submit', async (e) => {
      |  e.preventDefault();
      |  status.textContent = 'running…';
      |  out.replaceChildren();
      |  const t0 = performance.now();
      |  try {
      |    const resp = await fetch('query?query=' +
      |      encodeURIComponent(document.getElementById('q').value));
      |    const ms = Math.round(performance.now() - t0);
      |    if (!resp.ok) {
      |      status.textContent = '';
      |      const pre = document.createElement('pre');
      |      pre.className = 'err';
      |      pre.textContent = 'HTTP ' + resp.status + '\n' + await resp.text();
      |      out.replaceChildren(pre);
      |      return;
      |    }
      |    const json = await resp.json();
      |    const n = json.results && json.results.bindings
      |      ? json.results.bindings.length + ' rows · ' : '';
      |    status.textContent = n + ms + ' ms';
      |    render(json);
      |  } catch (err) {
      |    status.textContent = '';
      |    const pre = document.createElement('pre');
      |    pre.className = 'err';
      |    pre.textContent = 'network error: ' + err;
      |    out.replaceChildren(pre);
      |  }
      |});
      |</script>
      |</body>
      |</html>
      |""".stripMargin
}
