-- Lameness-TPU database schema
-- Generated from lameness_tpu/io/db.py::_SCHEMA (the single source of
-- truth the sqlite backend executes). The DDL below is portable SQL and
-- runs unchanged on PostgreSQL for deployments that point Database at a
-- real PG server (reference analog: scripts/init_db.sql mirroring the
-- admin backend's ORM models).
-- Regenerate with: python -c "from lameness_tpu.io import db;\
--   print(open('scripts/init_db.sql').read())"  (kept in sync by
--   tests/test_scripts.py::test_init_db_sql_in_sync)

CREATE TABLE IF NOT EXISTS users (
    id TEXT PRIMARY KEY,
    email TEXT UNIQUE NOT NULL,
    username TEXT UNIQUE NOT NULL,
    password_hash TEXT NOT NULL,
    role TEXT NOT NULL DEFAULT 'rater' CHECK (role IN ('admin','researcher','rater')),
    is_active INTEGER DEFAULT 1,
    rater_tier TEXT,
    created_at TEXT,
    last_login TEXT
);
CREATE TABLE IF NOT EXISTS sessions (
    id TEXT PRIMARY KEY,
    user_id TEXT NOT NULL REFERENCES users(id) ON DELETE CASCADE,
    token_hash TEXT NOT NULL,
    expires_at TEXT NOT NULL,
    created_at TEXT
);
CREATE TABLE IF NOT EXISTS processing_jobs (
    job_id TEXT PRIMARY KEY,
    video_id TEXT NOT NULL,
    status TEXT DEFAULT 'pending' CHECK (status IN
        ('pending','processing','completed','failed','cancelled')),
    priority INTEGER DEFAULT 0,
    progress REAL DEFAULT 0.0,
    current_pipeline TEXT,
    created_at TEXT,
    started_at TEXT,
    completed_at TEXT,
    error_message TEXT,
    user_id TEXT REFERENCES users(id)
);
CREATE INDEX IF NOT EXISTS idx_jobs_video ON processing_jobs(video_id);
CREATE TABLE IF NOT EXISTS videos (
    id TEXT PRIMARY KEY,
    filename TEXT NOT NULL,
    original_filename TEXT,
    file_size INTEGER NOT NULL,
    storage_backend TEXT NOT NULL DEFAULT 'local',
    s3_key TEXT,
    file_path TEXT,
    label INTEGER,
    label_confidence TEXT,
    status TEXT DEFAULT 'uploaded',
    has_analysis INTEGER DEFAULT 0,
    has_annotated INTEGER DEFAULT 0,
    duration REAL, fps REAL, width INTEGER, height INTEGER,
    frame_count INTEGER,
    uploaded_by TEXT REFERENCES users(id),
    uploaded_at TEXT,
    processed_at TEXT
);
CREATE INDEX IF NOT EXISTS idx_videos_status ON videos(status);
CREATE INDEX IF NOT EXISTS idx_videos_label ON videos(label);
CREATE TABLE IF NOT EXISTS gold_tasks (
    id TEXT PRIMARY KEY,
    video_id_1 TEXT NOT NULL,
    video_id_2 TEXT NOT NULL,
    correct_winner INTEGER NOT NULL CHECK (correct_winner IN (0,1,2)),
    correct_degree INTEGER DEFAULT 2 CHECK (correct_degree BETWEEN 1 AND 3),
    difficulty TEXT DEFAULT 'medium' CHECK (difficulty IN ('easy','medium','hard')),
    description TEXT, hint TEXT,
    is_tutorial INTEGER DEFAULT 0,
    tutorial_order INTEGER,
    created_by TEXT REFERENCES users(id),
    is_active INTEGER DEFAULT 1,
    created_at TEXT
);
CREATE TABLE IF NOT EXISTS rater_stats (
    id TEXT PRIMARY KEY,
    user_id TEXT UNIQUE NOT NULL REFERENCES users(id) ON DELETE CASCADE,
    total_comparisons INTEGER DEFAULT 0,
    gold_task_accuracy REAL DEFAULT 0.0,
    agreement_rate REAL DEFAULT 0.0,
    weight REAL DEFAULT 1.0,
    tier TEXT DEFAULT 'bronze',
    last_activity TEXT,
    updated_at TEXT
);
CREATE TABLE IF NOT EXISTS service_heartbeats (
    id TEXT PRIMARY KEY,
    service_name TEXT UNIQUE NOT NULL,
    status TEXT DEFAULT 'unknown',
    last_heartbeat TEXT,
    active_jobs INTEGER DEFAULT 0,
    success_count INTEGER DEFAULT 0,
    error_count INTEGER DEFAULT 0,
    last_error TEXT,
    extra_data TEXT
);
CREATE TABLE IF NOT EXISTS video_elo_ratings (
    id TEXT PRIMARY KEY,
    video_id TEXT UNIQUE NOT NULL,
    elo_rating REAL DEFAULT 1500.0,
    elo_uncertainty REAL DEFAULT 350.0,
    wins INTEGER DEFAULT 0,
    losses INTEGER DEFAULT 0,
    ties INTEGER DEFAULT 0,
    total_comparisons INTEGER DEFAULT 0,
    win_probability REAL DEFAULT 0.5,
    normalized_score REAL,
    rank_position INTEGER,
    created_at TEXT,
    updated_at TEXT
);
CREATE TABLE IF NOT EXISTS pairwise_comparisons (
    id TEXT PRIMARY KEY,
    video_id_1 TEXT NOT NULL,
    video_id_2 TEXT NOT NULL,
    winner INTEGER NOT NULL CHECK (winner IN (0,1,2)),
    degree INTEGER DEFAULT 1 CHECK (degree BETWEEN 0 AND 3),
    confidence TEXT DEFAULT 'confident',
    rater_id TEXT REFERENCES users(id),
    rater_weight REAL DEFAULT 1.0,
    is_gold_task INTEGER DEFAULT 0,
    created_at TEXT
);
CREATE INDEX IF NOT EXISTS idx_pc_v1 ON pairwise_comparisons(video_id_1);
CREATE INDEX IF NOT EXISTS idx_pc_v2 ON pairwise_comparisons(video_id_2);
CREATE TABLE IF NOT EXISTS elo_history (
    id TEXT PRIMARY KEY,
    video_id TEXT NOT NULL,
    elo_rating REAL NOT NULL,
    comparison_count INTEGER NOT NULL,
    recorded_at TEXT
);
CREATE TABLE IF NOT EXISTS hierarchy_snapshots (
    id TEXT PRIMARY KEY,
    name TEXT NOT NULL,
    description TEXT,
    total_videos INTEGER NOT NULL,
    total_comparisons INTEGER NOT NULL,
    steepness REAL,
    steepness_std REAL,
    inter_rater_reliability REAL,
    ranking_data TEXT NOT NULL,
    created_by TEXT REFERENCES users(id),
    created_at TEXT
);
CREATE TABLE IF NOT EXISTS cow_identities (
    id TEXT PRIMARY KEY,
    cow_id TEXT UNIQUE NOT NULL,
    tag_number TEXT,
    total_sightings INTEGER DEFAULT 0,
    first_seen TEXT,
    last_seen TEXT,
    embedding_version TEXT DEFAULT 'dinov3-base',
    notes TEXT,
    is_active INTEGER DEFAULT 1
);
CREATE TABLE IF NOT EXISTS track_history (
    id TEXT PRIMARY KEY,
    video_id TEXT NOT NULL,
    track_id INTEGER NOT NULL,
    cow_id TEXT REFERENCES cow_identities(id),
    reid_confidence REAL,
    start_frame INTEGER,
    end_frame INTEGER,
    total_frames INTEGER,
    avg_confidence REAL,
    created_at TEXT
);
CREATE INDEX IF NOT EXISTS idx_th_video ON track_history(video_id);
CREATE TABLE IF NOT EXISTS lameness_records (
    id TEXT PRIMARY KEY,
    cow_id TEXT NOT NULL REFERENCES cow_identities(id),
    video_id TEXT NOT NULL,
    observation_date TEXT,
    fusion_score REAL, tleap_score REAL, tcn_score REAL,
    transformer_score REAL, gnn_score REAL, graph_transformer_score REAL,
    ml_ensemble_score REAL,
    is_lame INTEGER, confidence REAL, severity_level TEXT,
    human_validated INTEGER DEFAULT 0,
    human_label INTEGER,
    validator_id TEXT REFERENCES users(id),
    validation_date TEXT
);
CREATE INDEX IF NOT EXISTS idx_lr_cow ON lameness_records(cow_id);
