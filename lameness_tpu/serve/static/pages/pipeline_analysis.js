// PipelineAnalysis.tsx: per-stage timing breakdown, message throughput by
// subject, queue depth — the perf view of the fused engine.
import {api, h, main, fmt, esc, table} from "/static/app.js";

export default async function PipelineAnalysis() {
  const [tp, queue] = await Promise.all([
    api("/api/health/throughput"), api("/api/pipeline/queue")]);
  const timings = Object.entries(tp.stage_timings || {});
  const subjects = Object.entries(tp.per_subject || {})
    .sort((a, b) => b[1] - a[1]);
  const smax = Math.max(...subjects.map(s => s[1]), 1);

  main.append(h(`<div class="grid">
    <div class="panel"><div class="dim">messages (window)</div>
      <div class="stat">${tp.messages}</div>
      <div class="dim">${fmt(tp.window_s / 60, 0)} min window</div></div>
    <div class="panel"><div class="dim">videos analyzed</div>
      <div class="stat">${tp.videos_analyzed}</div>
      <div class="dim">${fmt(tp.videos_per_hour, 1)}/hour</div></div>
    <div class="panel"><div class="dim">queue depth</div>
      <div class="stat">${(queue.jobs_by_status || {}).processing || 0}</div>
      <div class="dim">processing jobs</div></div>
  </div>
  <div class="panel"><h2>Stage timings
      <span class="dim">(host-side timers around each engine stage)</span></h2>
    <div id="timings"></div></div>
  <div class="panel"><h2>Messages by subject</h2><div id="subj"></div></div>`));

  document.getElementById("timings").innerHTML = timings.length
    ? table(timings, [
        ["stage", t => esc(t[0])],
        ["calls", t => t[1].count],
        ["mean s", t => fmt(t[1].mean_s)],
        ["p50 s", t => fmt(t[1].p50_s)],
        ["max s", t => fmt(t[1].max_s)],
        ["total s", t => fmt(t[1].total_s, 1)]])
    : `<span class="dim">no timings yet — process a video</span>`;

  document.getElementById("subj").innerHTML = subjects.length
    ? subjects.map(([s, n]) => `<div class="row" style="margin-bottom:2px">
        <span class="dim" style="width:210px">${esc(s)}</span>
        <div class="bar" style="width:280px"><i style="width:${
          100 * n / smax}%"></i></div><span>${n}</span></div>`).join("")
    : `<span class="dim">no traffic in the window</span>`;
}
