package graft.api

/** The two dashboard pages the reference serves with Flask/Jinja
  * (`templates/realtime_dashboard.html:1-453`,
  * `templates/historical_data.html:1-342`, rendered by `app.py:86-90` and
  * `app.py:138-151`) — re-expressed as self-contained static HTML with
  * the dropdown data injected server-side (the Jinja `render_template`
  * substitution), polling the same six JSON routes [[HttpApi]] serves.
  * Original markup/JS, not a copy of the reference templates: same
  * functionality (symbol dropdown, stat tiles, auto-refreshing Chart.js
  * line charts, range buttons, forecast overlay), our own structure.
  *
  * Chart.js loads from its public CDN exactly as the reference pages do;
  * the pages degrade to the raw JSON links when offline.
  */
object Pages {

  private def jsStrArr(items: Seq[String]): String =
    items.map(s => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") +
      "\"").mkString("[", ",", "]")

  private val Style =
    """body{font-family:system-ui,sans-serif;margin:0;background:#10141a;color:#e6e8eb}
      |header{padding:12px 20px;background:#171c24;display:flex;gap:16px;align-items:center}
      |h1{font-size:18px;margin:0}
      |select,button{background:#222a35;color:#e6e8eb;border:1px solid #39424e;border-radius:6px;padding:6px 10px}
      |button.active{background:#3d5afe;border-color:#3d5afe}
      |main{padding:20px;max-width:1100px;margin:0 auto}
      |.tiles{display:flex;gap:12px;flex-wrap:wrap;margin-bottom:16px}
      |.tile{background:#171c24;border-radius:8px;padding:12px 16px;min-width:140px}
      |.tile .k{font-size:12px;color:#9aa4b0}
      |.tile .v{font-size:20px;font-weight:600;margin-top:4px}
      |.chartbox{background:#171c24;border-radius:8px;padding:16px}
      |""".stripMargin

  /** Realtime dashboard: stat tiles from `/api/realtime_stats/{sym}`,
    * a 1-minute close chart from `/api/chart_data_1m/{sym}`, refreshed
    * every 5 s (the reference's poll cadence).
    */
  def realtime(symbols: Seq[String]): String =
    s"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Realtime Dashboard</title>
<script src="https://cdn.jsdelivr.net/npm/chart.js"></script>
<style>$Style</style></head>
<body>
<header><h1>Realtime</h1>
<select id="sym"></select>
<a href="/historical" style="color:#9aa4b0">historical &rarr;</a></header>
<main>
<div class="tiles">
<div class="tile"><div class="k">Last price</div><div class="v" id="t_price">&ndash;</div></div>
<div class="tile"><div class="k">Last volume</div><div class="v" id="t_vol">&ndash;</div></div>
<div class="tile"><div class="k">Window high</div><div class="v" id="t_high">&ndash;</div></div>
<div class="tile"><div class="k">Window low</div><div class="v" id="t_low">&ndash;</div></div>
</div>
<div class="chartbox"><canvas id="chart" height="110"></canvas></div>
</main>
<script>
const SYMBOLS = ${jsStrArr(symbols)};
const sel = document.getElementById('sym');
SYMBOLS.forEach(s => { const o = document.createElement('option');
  o.value = s; o.textContent = s; sel.appendChild(o); });
let chart = null;
function enc(s) { return s.replaceAll('/', '-'); }
async function refresh() {
  const sym = sel.value; if (!sym) return;
  try {
    const st = await (await fetch('/api/realtime_stats/' + enc(sym))).json();
    const latest = st.latest || {}, stats = st.stats || {};
    const set = (id, v) => { document.getElementById(id).textContent =
      (v === undefined || v === null) ? '\\u2013' : v; };
    set('t_price', latest.close_price); set('t_vol', latest.volume);
    set('t_high', stats.high); set('t_low', stats.low);
    const pts = await (await fetch('/api/chart_data_1m/' + enc(sym))).json();
    const labels = pts.map(p => new Date(p[0]).toISOString().substr(11, 8));
    const data = pts.map(p => p[1]);
    if (!chart && window.Chart) {
      chart = new Chart(document.getElementById('chart'), {
        type: 'line',
        data: { labels: labels, datasets: [{ label: sym + ' close (1m)',
          data: data, borderColor: 'rgb(75, 192, 192)', tension: 0.1,
          fill: false, pointRadius: 0 }] },
        options: { animation: false, scales: { y: { beginAtZero: false } } }
      });
    } else if (chart) {
      chart.data.labels = labels;
      chart.data.datasets[0].label = sym + ' close (1m)';
      chart.data.datasets[0].data = data;
      chart.update();
    }
  } catch (e) { console.error(e); }
}
sel.addEventListener('change', () => { if (chart) { chart.destroy(); chart = null; } refresh(); });
refresh(); setInterval(refresh, 5000);
</script>
</body></html>
"""

  /** Historical dashboard: Chart.js payload served VERBATIM by
    * `/api/historical_data/{sym_tf}?range=` (labels + datasets are the
    * golden JSON, so the page hands them straight to Chart.js), range
    * buttons, and the XGBoost-route forecast appended as an overlay
    * dataset.
    */
  def historical(pairs: Seq[String]): String =
    s"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Historical Data</title>
<script src="https://cdn.jsdelivr.net/npm/chart.js"></script>
<style>$Style</style></head>
<body>
<header><h1>Historical</h1>
<select id="pair"></select>
<span id="ranges">
<button data-r="1m">1m</button><button data-r="3m">3m</button>
<button data-r="1y">1y</button><button data-r="all" class="active">all</button>
</span>
<button id="predict">predict</button>
<a href="/" style="color:#9aa4b0">&larr; realtime</a></header>
<main><div class="chartbox"><canvas id="chart" height="120"></canvas></div></main>
<script>
const PAIRS = ${jsStrArr(pairs)};
const sel = document.getElementById('pair');
PAIRS.forEach(p => { const o = document.createElement('option');
  o.value = p; o.textContent = p; sel.appendChild(o); });
let chart = null, range = 'all';
async function draw() {
  const pair = sel.value; if (!pair) return;
  try {
    const payload = await (await fetch('/api/historical_data/' + pair +
      '?range=' + range)).json();
    if (chart) { chart.destroy(); chart = null; }
    if (window.Chart)
      chart = new Chart(document.getElementById('chart'), {
        type: 'line', data: payload,
        options: { animation: false, spanGaps: true,
          elements: { point: { radius: 0 } } }
      });
  } catch (e) { console.error(e); }
}
document.querySelectorAll('#ranges button').forEach(b =>
  b.addEventListener('click', () => {
    document.querySelectorAll('#ranges button').forEach(x =>
      x.classList.remove('active'));
    b.classList.add('active'); range = b.dataset.r; draw();
  }));
document.getElementById('predict').addEventListener('click', async () => {
  if (!chart) return;
  try {
    const preds = await (await fetch('/api/predict_xgboost/' +
      sel.value)).json();
    if (!Array.isArray(preds)) { alert(preds.error || 'no prediction'); return; }
    chart.data.labels = chart.data.labels.concat(
      preds.map(p => new Date(p.timestamp).toISOString().replace('T', ' ').substr(0, 19)));
    chart.data.datasets.push({ label: 'forecast',
      data: new Array(chart.data.labels.length - preds.length).fill(null)
        .concat(preds.map(p => p.predicted_price)),
      borderColor: 'rgb(255, 99, 132)', borderDash: [6, 4], tension: 0.1,
      fill: false });
    chart.update();
  } catch (e) { console.error(e); }
});
sel.addEventListener('change', draw);
draw();
</script>
</body></html>
"""
}
