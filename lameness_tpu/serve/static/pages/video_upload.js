// VideoUpload.tsx: direct upload + the S3-style presigned flow, with live
// pipeline progress over the WS channel.
import {api, h, main, esc, toast, ws} from "/static/app.js";

export default async function VideoUpload() {
  main.append(h(`<div class="panel"><h2>Upload video</h2>
    <div class="row"><input type="file" id="file" accept="video/*" multiple>
      <button class="action" id="send">Upload &amp; analyze</button></div>
    <div class="row dim">Each upload runs the full pipeline: preprocess →
      YOLO/SAM/DINO/pose → tracking → predictors → fusion.</div>
    <div id="jobs"></div></div>
  <div class="panel"><h2>Presigned flow (S3-compatible)</h2>
    <div class="row"><input id="s3name" placeholder="filename.mp4">
      <button class="ghost" id="s3go">Request upload URL</button></div>
    <pre id="s3out" style="display:none"></pre></div>
  <div class="panel"><h2>Pipeline progress</h2>
    <pre id="prog">events appear here while uploads process…</pre></div>`));

  const progress = {};
  const prog = document.getElementById("prog");
  ws("pipeline", (msg) => {
    if (!msg.video_id) return;
    (progress[msg.video_id] = progress[msg.video_id] || []).push(msg.type);
    prog.textContent = Object.entries(progress).map(([v, stages]) =>
      `${v.slice(0, 8)}  ${stages.join(" → ")}`).join("\n");
  });

  document.getElementById("send").onclick = async () => {
    const files = [...document.getElementById("file").files];
    if (!files.length) return toast("choose at least one file", "warn");
    const jobs = document.getElementById("jobs");
    for (const f of files) {
      const row = h(`<div class="row"><span class="badge">${esc(f.name)}</span>
        <span class="dim">uploading…</span></div>`);
      jobs.append(row);
      try {
        const r = await fetch(
          `/api/videos/upload?filename=${encodeURIComponent(f.name)}`,
          {method: "POST", body: await f.arrayBuffer()});
        const data = await r.json();
        row.lastElementChild.innerHTML =
          `→ video_id <b>${esc(data.video_id)}</b> (${esc(data.status || "processing")})`;
      } catch (e) {
        row.lastElementChild.textContent = "failed: " + e.message;
      }
    }
  };

  document.getElementById("s3go").onclick = async () => {
    const name = document.getElementById("s3name").value || "video.mp4";
    try {
      const r = await api("/api/videos/upload-url",
                          {json: {filename: name}});
      const out = document.getElementById("s3out");
      out.style.display = "";
      out.textContent = JSON.stringify(r, null, 2) +
        "\n\nPUT the bytes to upload_url, then POST " +
        `/api/videos/${r.video_id}/confirm-upload`;
    } catch (e) { toast(e.message, "bad"); }
  };
}
