// SystemHealth.tsx: infra overview — bus, vector store, disk, services.
import {api, h, main, fmt, esc, table} from "/static/app.js";

export default async function SystemHealth() {
  const hl = await api("/api/health/overview");
  const svc = Object.entries(hl.services || {});
  main.append(h(`<div class="grid">
    <div class="panel"><div class="dim">message bus</div>
      <div class="stat ${hl.bus.status === 'healthy' ? 'ok' : 'bad'}">
        ${esc(hl.bus.status)}</div>
      <div class="dim">${hl.bus.messages} messages ·
        <span class="${hl.bus.errors ? 'bad' : ''}">${hl.bus.errors} errors</span></div></div>
    <div class="panel"><div class="dim">vector store</div>
      <div class="stat ${hl.vector_store.status === 'healthy' ? 'ok' : 'bad'}">
        ${esc(hl.vector_store.status)}</div>
      <div class="dim">collections: ${hl.vector_store.collections
        .map(esc).join(", ") || "none"}</div></div>
    <div class="panel"><div class="dim">disk
        <span class="dim">(warn 75% / critical 90%)</span></div>
      <div class="stat ${hl.disk.status === 'healthy' ? 'ok'
        : hl.disk.status === 'warning' ? 'warn' : 'bad'}">${hl.disk.percent_used}%</div>
      <div class="bar" style="margin-top:6px"><i style="width:${hl.disk.percent_used}%;
        background:${hl.disk.status === 'healthy' ? 'var(--ok)' : 'var(--warn)'}"></i></div>
      <div class="dim">${hl.disk.free_gb} GB free</div></div>
    <div class="panel"><div class="dim">uptime</div>
      <div class="stat">${fmt(hl.uptime_s / 60, 0)}<span class="dim">min</span></div></div>
  </div>
  <div class="panel"><h2>Service heartbeats</h2><div id="svc"></div></div>
  <div class="panel"><h2>Raw</h2><pre>${esc(JSON.stringify(hl, null, 2))}</pre></div>`));
  document.getElementById("svc").innerHTML = svc.length
    ? table(svc, [["service", e => esc(e[0])],
        ["status", e => `<span class="${e[1] === 'healthy' ? 'ok' : 'bad'}">
          ${esc(e[1])}</span>`]])
    : `<span class="dim">no heartbeats yet</span>`;
}
