// CowDetail.tsx: per-cow drill-down — aggregated prediction, lameness
// history chart, sightings, registry editing.
import {api, h, main, pct, fmt, esc, short, when, gauge, sparkline, table,
        toast, sevBadge, USER} from "/static/app.js";

export default async function CowDetail(cowId) {
  if (!cowId) return window.go("cows");
  const cow = await api(`/api/cows/${cowId}`);
  const [hist, vids] = await Promise.all([
    api(`/api/cows/${cowId}/lameness-history`),
    api(`/api/cows/${cowId}/videos`).catch(() => [])]);
  let pred = null;
  try { pred = (await api(`/api/cows/${cowId}/prediction`)).prediction; }
  catch (e) {}

  const privileged = USER && ["admin", "researcher"].includes(USER.role);
  main.append(h(`<div class="panel"><h2>${esc(cowId)}
      <button class="mini" onclick="go('cows')">back</button></h2>
    <div class="vs">
      <div class="panel">${pred ? gauge(pred.aggregated_score, "aggregated")
        : '<span class="dim">no prediction yet</span>'}
        ${pred ? `<div>${sevBadge(pred.aggregated_score)}
          <span class="badge">${esc(pred.severity_level)}</span></div>
          <div class="dim">${pred.num_videos} videos ·
          confidence ${pct(pred.confidence)}</div>` : ""}</div>
      <div class="panel" style="flex:1;text-align:left"><h3>Registry</h3>
        <div class="kv">
          <span class="dim">tag</span><b>${esc(cow.tag_number || "—")}</b>
          <span class="dim">breed</span><b>${esc(cow.breed || "—")}</b>
          <span class="dim">sightings</span><b>${cow.total_sightings}</b>
          <span class="dim">first seen</span><b>${when(cow.first_seen)}</b>
          <span class="dim">last seen</span><b>${when(cow.last_seen)}</b>
          <span class="dim">validated</span><b>${cow.is_validated ? "yes" : "no"}</b>
        </div>
        ${privileged ? `<div class="row" style="margin-top:10px">
          <input id="tag" placeholder="tag number" value="${esc(cow.tag_number || "")}">
          <input id="breed" placeholder="breed" value="${esc(cow.breed || "")}">
          <button class="ghost" id="save">Save</button>
          <button class="ghost" id="validate">${cow.is_validated
            ? "Unvalidate" : "Validate"}</button></div>` : ""}</div>
    </div></div>
  <div class="panel"><h2>Lameness history</h2><div id="chart"></div>
    <div id="hist"></div></div>
  <div class="panel"><h2>Videos of this cow</h2><div id="vids"></div></div>`));

  document.getElementById("chart").innerHTML = hist.length > 1
    ? sparkline(hist.map(r => r.fusion_score).filter(x => x != null),
                {w: 560, h: 80, ymin: 0, ymax: 1})
    : "";
  document.getElementById("hist").innerHTML = hist.length ? table(hist, [
    ["date", r => `<span class="dim">${when(r.observation_date)}</span>`],
    ["video", r => `<span class="dim">${short(r.video_id, 12)}</span>`],
    ["fusion", r => pct(r.fusion_score)],
    ["severity", r => sevBadge(r.fusion_score)],
    ["lame", r => r.is_lame ? "yes" : "no"],
    ["", r => `<button class="mini" onclick="go('analysis','${r.video_id}')">
       analysis</button>`],
  ]) : `<span class="dim">no lameness records yet</span>`;

  document.getElementById("vids").innerHTML = vids.length ? table(vids, [
    ["video", v => `<span class="dim">${short(v.video_id || v.id, 14)}</span>`],
    ["seen", v => `<span class="dim">${when(v.created_at || v.first_seen_at)}</span>`],
    ["track", v => v.track_id ?? "—"],
    ["", v => `<button class="mini"
       onclick="go('analysis','${v.video_id || v.id}')">analysis</button>`],
  ]) : `<span class="dim">no linked videos</span>`;

  const save = document.getElementById("save");
  if (save) save.onclick = async () => {
    try {
      await api(`/api/cows/${cowId}`, {method: "PATCH", json: {
        tag_number: document.getElementById("tag").value || null,
        breed: document.getElementById("breed").value || null}});
      toast("saved"); window.go("cow", cowId);
    } catch (e) { toast(e.message, "bad"); }
  };
  const validate = document.getElementById("validate");
  if (validate) validate.onclick = async () => {
    try {
      await api(`/api/cows/${cowId}`, {method: "PATCH",
                json: {is_validated: cow.is_validated ? 0 : 1}});
      window.go("cow", cowId);
    } catch (e) { toast(e.message, "bad"); }
  };
}
