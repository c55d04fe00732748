// PipelineMonitor.tsx: heartbeats, live event feed, per-service logs,
// manual re-trigger.
import {api, h, main, esc, short, when, table, toast, ws, USER}
  from "/static/app.js";

export default async function PipelineMonitor() {
  const [status, queue] = await Promise.all([
    api("/api/pipeline/status"), api("/api/pipeline/queue")]);
  const privileged = USER && ["admin", "researcher"].includes(USER.role);
  main.append(h(`<div class="panel"><h2>Live events
      <span class="dim">(websocket /api/ws/pipeline)</span></h2>
    <pre id="feed" style="max-height:160px">waiting for events…</pre></div>
  <div class="panel"><h2>Pipeline services</h2><div id="svc"></div></div>
  <div class="vs">
    <div class="panel" style="flex:1"><h2>Queue</h2><div class="kv">
      ${Object.entries(queue.jobs_by_status || {}).map(([k, v]) =>
        `<span class="dim">${esc(k)}</span><b>${v}</b>`).join("")}
      <span class="dim">bus messages</span><b>${queue.bus_messages}</b>
      <span class="dim">bus errors</span>
      <b class="${queue.bus_errors ? 'bad' : ''}">${queue.bus_errors}</b>
    </div></div>
    ${privileged ? `<div class="panel" style="flex:1"><h2>Re-trigger</h2>
      <div class="row"><input id="rv" placeholder="video id">
        <select id="rs"><option>all</option><option>yolo</option>
          <option>ml</option><option>fusion</option></select>
        <button class="ghost" id="rgo">Re-run</button></div></div>` : ""}
  </div>
  <div class="panel"><h2>Service logs <span class="dim">(bus journal)</span></h2>
    <div class="row"><select id="logsvc"><option>yolo</option><option>sam3</option>
      <option>dinov3</option><option>tleap</option><option>tcn</option>
      <option>transformer</option><option>gnn</option><option>ml</option>
      <option>tracking</option><option>fusion</option><option>analysis</option>
      </select>
      <button class="ghost" id="loggo">Load</button></div>
    <pre id="logs">pick a service</pre></div>`));

  const lines = [];
  const feed = document.getElementById("feed");
  ws("pipeline", (msg) => {
    lines.unshift(`${new Date().toLocaleTimeString()}  ${msg.type || ""}  ` +
                  `${msg.video_id || ""}`);
    feed.textContent = lines.slice(0, 14).join("\n");
  });

  document.getElementById("svc").innerHTML = status.length ? table(status, [
    ["service", s => esc(s.service_name)],
    ["status", s => `<span class="${s.status === 'healthy' ? 'ok' : 'warn'}">
      ${esc(s.status)}</span>`],
    ["jobs", s => s.active_jobs],
    ["ok", s => s.success_count],
    ["err", s => `<span class="${s.error_count ? 'bad' : ''}">${s.error_count}</span>`],
    ["last beat", s => `<span class="dim">${when(s.last_heartbeat)}</span>`],
    ["last error", s => `<span class="dim">${esc((s.last_error || "").slice(0, 60))}</span>`],
  ]) : `<span class="dim">no heartbeats yet — services post
      /api/pipeline/heartbeat as they work</span>`;

  const rgo = document.getElementById("rgo");
  if (rgo) rgo.onclick = async () => {
    const vid = document.getElementById("rv").value.trim();
    if (!vid) return toast("enter a video id", "warn");
    try {
      const svc = document.getElementById("rs").value;
      await api(`/api/pipeline/retrigger/${svc}/${vid}`, {method: "POST"});
      toast("re-triggered");
    } catch (e) { toast(e.message, "bad"); }
  };
  document.getElementById("loggo").onclick = async () => {
    const svc = document.getElementById("logsvc").value;
    const logs = await api(`/api/pipeline/logs/${svc}`);
    document.getElementById("logs").textContent =
      logs.messages.map(m => `${new Date(m.ts * 1000).toLocaleTimeString()}  ` +
        `${m.subject}  ${JSON.stringify(m.payload).slice(0, 110)}`).join("\n") +
      (logs.errors.length ? "\n\nERRORS:\n" +
        logs.errors.map(e => JSON.stringify(e)).join("\n") : "") ||
      "no messages for this service yet";
  };
}
