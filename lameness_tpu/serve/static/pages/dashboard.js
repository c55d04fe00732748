// Dashboard.tsx: headline stats, service health, recent videos, live feed.
import {api, h, main, pct, fmt, esc, short, when, table, ws, sevBadge}
  from "/static/app.js";

export default async function Dashboard() {
  const [hl, stats, cows, tp, vids] = await Promise.all([
    api("/api/health/overview"), api("/api/training/stats"),
    api("/api/cows/summary/stats"), api("/api/health/throughput"),
    api("/api/videos?limit=8")]);
  main.append(h(`<div class="grid">
    <div class="panel"><div class="dim">videos analyzed (1h)</div>
      <div class="stat">${tp.videos_analyzed}</div>
      <div class="dim">${fmt(tp.videos_per_hour, 1)}/h</div></div>
    <div class="panel"><div class="dim">labeled videos</div>
      <div class="stat">${stats.total_labeled}</div>
      <div class="dim">${stats.lame} lame / ${stats.sound} sound</div></div>
    <div class="panel"><div class="dim">pairwise comparisons</div>
      <div class="stat">${stats.pairwise_comparisons}</div></div>
    <div class="panel"><div class="dim">cows tracked</div>
      <div class="stat">${cows.total_cows}</div>
      <div class="dim">${cows.cows_with_lameness} with lameness</div></div>
    <div class="panel"><div class="dim">disk</div>
      <div class="stat ${hl.disk.status === 'healthy' ? 'ok' : 'warn'}">
        ${hl.disk.percent_used}%</div>
      <div class="dim">${hl.disk.free_gb} GB free</div></div>
    <div class="panel"><div class="dim">bus messages</div>
      <div class="stat">${hl.bus.messages}</div>
      <div class="dim">${hl.bus.errors} errors · up ${fmt(hl.uptime_s / 60, 0)} min</div></div>
  </div>
  <div class="vs" style="align-items:flex-start">
    <div class="panel" style="flex:1"><h2>Recent videos</h2><div id="recent"></div></div>
    <div class="panel" style="flex:1"><h2>Services</h2><div id="svc"></div>
      <h2 style="margin-top:12px">Live events</h2>
      <pre id="feed" style="max-height:140px">waiting…</pre></div>
  </div>`));

  document.getElementById("recent").innerHTML = vids.length ? table(vids, [
    ["video", v => `<span class="dim">${short(v.id)}</span> ${esc(v.original_filename || v.filename || "")}`],
    ["status", v => `<span class="badge">${esc(v.status)}</span>`],
    ["label", v => v.label == null ? "—" : v.label ? "lame" : "sound"],
    ["uploaded", v => `<span class="dim">${when(v.uploaded_at)}</span>`],
  ], {rowAttr: v => `class="click" onclick="go('analysis','${v.id}')"`})
    : `<span class="dim">no videos yet — try the Upload page</span>`;

  const entries = Object.entries(hl.services);
  document.getElementById("svc").innerHTML = entries.length
    ? table(entries, [
        ["service", e => esc(e[0])],
        ["status", e => `<span class="${e[1] === 'healthy' ? 'ok' : 'bad'}">${esc(e[1])}</span>`]])
    : `<span class="dim">no heartbeats yet</span>`;

  const lines = [];
  const feed = document.getElementById("feed");
  ws("pipeline", (msg) => {
    lines.unshift(`${new Date().toLocaleTimeString()}  ${msg.type || ""}  ${msg.video_id || ""}`);
    feed.textContent = lines.slice(0, 8).join("\n");
  });
}
