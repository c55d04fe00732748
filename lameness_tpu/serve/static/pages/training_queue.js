// TrainingQueue.tsx + TrainingModule's admin half: labeled-data stats,
// job queue, start ML/YOLO training, training status.
import {api, h, main, esc, short, when, table, toast, USER}
  from "/static/app.js";

export default async function TrainingQueue() {
  const [stats, status, queue] = await Promise.all([
    api("/api/training/stats"), api("/api/training/status"),
    api("/api/training/queue")]);
  const privileged = USER && ["admin", "researcher"].includes(USER.role);
  main.append(h(`<div class="grid">
    <div class="panel"><div class="dim">labeled videos</div>
      <div class="stat">${stats.total_labeled}</div>
      <div class="dim">${stats.lame} lame / ${stats.sound} sound ·
        min ${stats.min_new_videos} for retrain</div></div>
    <div class="panel"><div class="dim">pairwise comparisons</div>
      <div class="stat">${stats.pairwise_comparisons}</div></div>
    <div class="panel"><div class="dim">last training</div>
      <div class="stat" style="font-size:18px">${esc(status.status || "never_run")}</div>
      <div class="dim">${esc(status.completed_at || status.started_at || "")}</div></div>
  </div>
  ${privileged ? `<div class="panel"><h2>Start training</h2>
    <div class="row">
      <button class="action" id="ml">Train ML ensemble (GBDTs)</button>
      <button class="ghost" id="yolo">Train YOLO detector</button>
      <span class="dim">training runs via the bus
        (training.ml.requested / training.yolo.requested)</span></div></div>` : ""}
  <div class="panel"><h2>Training status</h2>
    <pre>${esc(JSON.stringify(status, null, 2))}</pre></div>
  <div class="panel"><h2>Processing jobs
      <span class="dim">${Object.entries(queue.by_status || {}).map(([k, v]) =>
        `${esc(k)}: ${v}`).join(" · ")}</span></h2><div id="jobs"></div></div>`));

  const jobs = (queue.jobs || []).slice(0, 40);
  document.getElementById("jobs").innerHTML = jobs.length ? table(jobs, [
    ["video", j => `<span class="dim">${short(j.video_id, 12)}</span>`],
    ["status", j => `<span class="badge ${j.status === 'completed' ? 'ok'
      : j.status === 'failed' ? 'bad' : ''}">${esc(j.status)}</span>`],
    ["stage", j => esc(j.current_stage || "—")],
    ["created", j => `<span class="dim">${when(j.created_at)}</span>`],
    ["error", j => `<span class="dim">${esc((j.error_message || "").slice(0, 60))}</span>`],
  ]) : `<span class="dim">no jobs yet</span>`;

  const ml = document.getElementById("ml");
  if (ml) ml.onclick = async () => {
    try {
      await api("/api/training/start/ml", {method: "POST"});
      toast("ML training requested");
      setTimeout(() => window.go("training"), 1500);
    } catch (e) { toast(e.message, "bad"); }
  };
  const yolo = document.getElementById("yolo");
  if (yolo) yolo.onclick = async () => {
    try {
      await api("/api/training/start/yolo", {method: "POST"});
      toast("YOLO training requested");
    } catch (e) { toast(e.message, "bad"); }
  };
}
