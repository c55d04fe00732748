// TutorialManagement.tsx: gold-task CRUD + auto-generation from Elo
// extremes (routers/tutorial.py).
import {api, h, main, esc, short, table, toast, USER} from "/static/app.js";

export default async function TutorialManagement() {
  const tasks = await api("/api/tutorial/tasks");
  const privileged = USER && ["admin", "researcher"].includes(USER.role);
  main.append(h(`<div class="panel"><h2>Gold tasks (${tasks.length})
      <span class="dim">— known-answer pairs used to calibrate rater
      reliability</span></h2>
    ${privileged ? `<div class="row">
      <button class="ghost" id="auto">Auto-generate from Elo extremes</button>
      </div>` : ""}
    <div id="list"></div></div>
  ${privileged ? `<div class="panel"><h2>Create gold task</h2>
    <div class="row"><input id="g1" placeholder="video id 1">
      <input id="g2" placeholder="video id 2">
      <select id="gw"><option value="1">video 1 lamer</option>
        <option value="2">video 2 lamer</option><option value="0">tie</option></select>
      <select id="gd"><option>easy</option><option selected>medium</option>
        <option>hard</option></select>
      <input id="gh" placeholder="hint for raters" style="width:220px">
      <label><input type="checkbox" id="gt"> tutorial</label>
      <button class="action" id="gcreate">Create</button></div></div>` : ""}`));

  document.getElementById("list").innerHTML = tasks.length ? table(tasks, [
    ["pair", t => `<span class="dim">${short(t.video_id_1)} vs
      ${short(t.video_id_2)}</span>`],
    ["answer", t => ["tie", "video 1", "video 2"][t.correct_winner]],
    ["difficulty", t => esc(t.difficulty)],
    ["tutorial", t => t.is_tutorial ? "✓" : ""],
    ["hint", t => `<span class="dim">${esc(t.hint || "")}</span>`],
    ["", t => privileged ? `<button class="mini" data-del="${t.id}">delete</button>` : ""],
  ]) : `<span class="dim">no gold tasks yet</span>`;

  document.querySelectorAll("button[data-del]").forEach(b => {
    b.onclick = async () => {
      try {
        await api(`/api/tutorial/tasks/${b.dataset.del}`, {method: "DELETE"});
        window.go("tutorial");
      } catch (e) { toast(e.message, "bad"); }
    };
  });
  const auto = document.getElementById("auto");
  if (auto) auto.onclick = async () => {
    try {
      const r = await api("/api/tutorial/auto-generate", {json: {count: 3}});
      toast(`created ${r.created ?? ""} tasks`); window.go("tutorial");
    } catch (e) { toast(e.message, "bad"); }
  };
  const create = document.getElementById("gcreate");
  if (create) create.onclick = async () => {
    try {
      await api("/api/tutorial/tasks", {json: {
        video_id_1: document.getElementById("g1").value.trim(),
        video_id_2: document.getElementById("g2").value.trim(),
        correct_winner: +document.getElementById("gw").value,
        difficulty: document.getElementById("gd").value,
        hint: document.getElementById("gh").value || null,
        is_tutorial: document.getElementById("gt").checked ? 1 : 0}});
      window.go("tutorial");
    } catch (e) { toast(e.message, "bad"); }
  };
}
